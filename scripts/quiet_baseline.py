#!/usr/bin/env python3
"""Regenerate graft/QuietBaseline.scala: per-query MIN seconds across every
BENCH_r*.json (driver runs) plus any local bench JSON lines passed as args.

Only the "queries" map of a bench line is harvested — the line also carries
a "load" map keyed by the SAME query names (per-query loadavg), which a
bare q-name regex would happily mistake for (much smaller) timings.

The current QuietBaseline.scala is re-harvested by default, which makes the
file a min() RATCHET: values can only ever decrease. That is right for
noise (a quiet value stays the quiet value) but wrong for reimplementation
— a query that legitimately got slower (or a bogus too-fast entry) would
be re-timed forever. Escape hatches:
  --fresh            ignore the existing file entirely (entries then come
                     only from BENCH_r*.json tails + the files given)
  --drop=qA,qB,...   flush just those queries' file entries (use after
                     reimplementing a query; pass a fresh bench line so
                     the new timing reseeds it)"""
import json, re, glob, sys

best = {}
args = sys.argv[1:]
fresh = '--fresh' in args

# Queries REIMPLEMENTED after their historical driver-tail timings: the
# old values describe code that no longer exists, and because this script
# is a min() ratchet over every BENCH_r*.json, a one-shot --drop gets
# re-min'd right back on the NEXT regeneration (exactly what happened to
# q45 in round 10: reseeded to the trained-quantizer 1.9 s, then a later
# regen re-harvested the fixed-id-era 0.76 s from the r9 tails). Entries
# here are dropped from historical sources on EVERY run; remove an entry
# only when the stale tails predate the oldest BENCH_r*.json kept.
PERSISTENT_DROPS = {
    "q45_knn_ivf",  # round 10: fixed-id IVF centroids -> k-means-trained
}

cli_drops = set()
for a in list(args):
    if a.startswith('--drop='):
        cli_drops |= {q.strip() for q in a[len('--drop='):].split(',') if q.strip()}
drops = cli_drops | PERSISTENT_DROPS
args = [a for a in args if a != '--fresh' and not a.startswith('--drop=')]

def feed_queries(queries, dropped=True):
    # dropped queries are excluded from HISTORICAL sources (driver tails,
    # the committed file) but not from files passed on the command line —
    # those are the fresh reseed measurements
    for k, v in queries.items():
        v = float(v)
        if v > 0 and not (dropped and k in drops):
            best[k] = min(best.get(k, 1e9), v)

def feed(text, historical=True):
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
                feed_queries(obj['queries'], dropped=historical)
                continue
        except (json.JSONDecodeError, ValueError):
            pass
        m = re.search(r'\\?"queries\\?":\{(.*?)\}', line)
        if m:
            found = dict(re.findall(
                r'\\?"(q\d+[a-z_0-9]*)\\?":(-?[0-9.]+)', m.group(1)))
            feed_queries(found, dropped=historical)

for f in sorted(glob.glob('/root/repo/BENCH_r*.json')):
    feed(json.load(open(f)).get('tail') or '')
for f in args:
    feed(open(f).read(), historical=False)

# The current QuietBaseline.scala is itself a source: many entries exist
# ONLY there (driver tails truncate; local bench lines are ephemeral).
# Without this, a bare regenerate silently DROPS every such entry and the
# re-timing guard stops covering those queries. PERSISTENT_DROPS entries
# DO harvest from here — the committed file carries their already-RESEEDED
# value (excluding them too would delete the entry outright on a bare
# regen, and "absent here" means "never re-timed"); only the one-shot
# --drop / --fresh flags flush the committed value, for the reseed run
# itself. The gate below uses the CLI --drop set as given (NOT
# drops - PERSISTENT_DROPS): an explicit --drop of a persistent-dropped
# query must still flush its committed value, or re-reseeding it would
# silently re-min the stale committed entry.
if not fresh:
    cur = open('/root/repo/src/main/scala/graft/QuietBaseline.scala').read()
    for k, v in re.findall(r'"(q\d+[a-z_0-9]*)" -> ([0-9.]+)', cur):
        v = float(v)
        if v > 0 and k not in cli_drops:
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
