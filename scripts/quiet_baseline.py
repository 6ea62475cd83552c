#!/usr/bin/env python3
"""Regenerate graft/QuietBaseline.scala: per-query MIN seconds across every
BENCH_r*.json (driver runs) plus any local bench JSON lines passed as args.

Only the "queries" map of a bench line is harvested — the line also carries
a "load" map keyed by the SAME query names (per-query loadavg), which a
bare q-name regex would happily mistake for (much smaller) timings."""
import json, re, glob, sys

best = {}

def feed_queries(queries):
    for k, v in queries.items():
        v = float(v)
        if v > 0:
            best[k] = min(best.get(k, 1e9), v)

def feed(text):
    # harvest every JSON object found in the text, but ONLY its "queries"
    # field; fall back to a regex scoped to the queries map for truncated /
    # escaped driver "tail" captures
    for line in text.splitlines():
        line = line.strip()
        start = line.find('{')
        if start < 0:
            continue
        try:
            obj = json.loads(line[start:])
            if isinstance(obj, dict) and isinstance(obj.get('queries'), dict):
                feed_queries(obj['queries'])
                continue
        except (json.JSONDecodeError, ValueError):
            pass
        m = re.search(r'\\?"queries\\?":\{(.*?)\}', line)
        if m:
            for k, v in re.findall(r'\\?"(q\d+[a-z_0-9]*)\\?":(-?[0-9.]+)', m.group(1)):
                v = float(v)
                if v > 0:
                    best[k] = min(best.get(k, 1e9), v)

for f in sorted(glob.glob('/root/repo/BENCH_r*.json')):
    feed(json.load(open(f)).get('tail') or '')
for f in sys.argv[1:]:
    feed(open(f).read())

# The current QuietBaseline.scala is itself a source: many entries exist
# ONLY there (driver tails truncate; local bench lines are ephemeral).
# Without this, a bare regenerate silently DROPS every such entry and the
# re-timing guard stops covering those queries.
cur = open('/root/repo/src/main/scala/graft/QuietBaseline.scala').read()
for k, v in re.findall(r'"(q\d+[a-z_0-9]*)" -> ([0-9.]+)', cur):
    v = float(v)
    if v > 0:
        best[k] = min(best.get(k, 1e9), v)

rows = '\n'.join(f'    "{k}" -> {best[k]:.3f},' for k in sorted(best))
body = f'''package graft

/** Known quiet-run (uncontended host) per-query seconds at sf0.1 —
  * the per-query MIN across every prior round's driver bench run.
  * `Bench` re-times (end-of-run, third pass) any query whose min-of-2
  * exceeds 2× its quiet value: two back-to-back throttled passes then
  * get one more chance minutes later, outside the throttle window.
  * Queries absent here (added after the last update) are never re-timed.
  * Regenerate with scripts/quiet_baseline.py after a clean local run. */
object QuietBaseline {{
  val secs: Map[String, Double] = Map(
{rows}
  )
}}
'''
open('/root/repo/src/main/scala/graft/QuietBaseline.scala', 'w').write(body)
print(f'wrote {len(best)} baselines')
