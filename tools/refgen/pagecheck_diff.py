import os, sys

def parse_status(path):
    rows = {}
    for line in open(path):
        f = line.rstrip("\n").split("\t")
        name = f[0]
        outcome = f[1]
        # normalize: refgen col5 may be '"parse_error"' / error debug; ours is bare
        kind = f[4].strip('"') if len(f) > 4 else "-"
        rt = f[2]
        count = int(f[3])
        rows[name] = (outcome, rt, count, kind)
    return rows

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pagecheck"
sc = parse_status(f"{BASE}/scala_status.tsv")
rf = parse_status(f"{BASE}/ref_out/status.tsv")
assert set(sc) == set(rf), f"name sets differ: {len(sc)} vs {len(rf)}"
mismatch = 0
triple_mismatch = 0
for name in sorted(sc):
    so, srt, scount, skind = sc[name]
    ro, rrt, rcount, rkind = rf[name]
    if so != ro:
        mismatch += 1
        print("OUTCOME DIFF", name, sc[name], rf[name])
        continue
    if so == "parse_err" and skind != rkind:
        mismatch += 1
        print("KIND DIFF", name, skind, rkind)
    if so == "produced":
        if srt != rrt:
            mismatch += 1
            print("RT DIFF", name, srt, rrt)
        # triples: scala is per-document DEDUPED; ref emits dups ->
        # compare scala lines vs first-occurrence-distinct of ref lines
        flat = name.replace("/", "_") + ".tsv"
        s_lines = open(f"{BASE}/scala_out/{flat}").read().rstrip("\n")
        r_raw = open(f"{BASE}/ref_out/{flat}").read().rstrip("\n")
        seen = set(); r_dedup = []
        for l in r_raw.split("\n") if r_raw else []:
            if l not in seen:
                seen.add(l); r_dedup.append(l)
        if s_lines != "\n".join(r_dedup):
            triple_mismatch += 1
            print("TRIPLES DIFF", name)
            print(" scala:", s_lines[:200])
            print(" ref  :", "\n".join(r_dedup)[:200])
outs = {}
for name in sc: outs[sc[name][0]] = outs.get(sc[name][0], 0) + 1
print("blocks:", len(sc), "outcomes:", outs)
print("status mismatches:", mismatch, "triple mismatches:", triple_mismatch)
sys.exit(1 if (mismatch or triple_mismatch) else 0)
