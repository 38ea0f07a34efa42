"""Aggregate a dev_r5_step_trace.py trace into op-class buckets.

Backs the PERF.md round-5 "tail decomposed" table: sums every traced
device op (not just the top-120 listing) by HLO op-class, and breaks the
pure-`copy` bucket down by (dest <- src) shape/layout signature so the
relayout copies can be attributed to their producers (sort-layout slab
rows, cross-attn output transposes).  Run dev_r5_step_trace.py first
(TDIR defaults to /tmp/r5_step_trace).
"""
import glob, gzip, json, collections, os, re

tdir = os.environ.get("TDIR", "/tmp/r5_step_trace")
NTRACE = int(os.environ.get("NTRACE", "2"))
f = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
ev = json.loads(gzip.open(f).read())["traceEvents"]
by_name = collections.defaultdict(float)
long_names = {}
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", ""); args = e.get("args") or {}
        if "run_id" in args or "long_name" in args:
            by_name[name] += e["dur"]
            ln = args.get("long_name", "")
            if ln and name not in long_names:
                long_names[name] = ln

items = [(k, v / NTRACE) for k, v in by_name.items() if not k.startswith("jit_")]
print(f"total {sum(v for _, v in items)/1e3:.1f} ms, {len(items)} op names")
buckets = collections.defaultdict(float); counts = collections.defaultdict(int)
for k, v in items:
    c = ("pallas-render" if "Network._render_views" in k
         else (re.match(r"([a-z_\-]+)", k) or [k, k])[1])
    buckets[c] += v; counts[c] += 1
for c, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{v/1e3:9.2f} ms  {counts[c]:5d} ops  {c}")

copies = [(k, v) for k, v in items if k.split(".")[0] == "copy"]
print(f"\ncopy bucket: {sum(v for _, v in copies)/1e3:.1f} ms over {len(copies)}")
byshape = collections.defaultdict(float); cnt = collections.defaultdict(int)
for k, v in copies:
    m = re.search(r"= ([^ ]+) copy\(([^ )]+)", long_names.get(k, ""))
    sig = f"{m.group(1)} <- {m.group(2)}" if m else "?"
    byshape[sig] += v; cnt[sig] += 1
for s, v in sorted(byshape.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{v/1e3:8.2f} ms {cnt[s]:5d}x  {s[:160]}")
