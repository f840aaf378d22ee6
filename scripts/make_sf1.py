#!/usr/bin/env python3
"""Amplify sf0.1 to a 10x "sf1" rehearsal dataset (builder tooling).

The driver generates sf0.001/0.01/0.1 only; the scale rehearsal
(VERDICT r3 item 7) needs one decade more. Amplification = 10
key-shifted copies of every fact table (dims region/nation stay as-is),
with foreign keys shifted consistently so every join still resolves.

Copies must NOT be textual/vector duplicates of the originals — that
would manufacture quadratic near-dup output (10-way dup cliques) and
measure output explosion instead of operator scaling. So:
 - documents copy k: tokens deterministically shuffled AND ~9% salted
   with a per-copy suffix. Shuffling alone is NOT enough: simhash is
   order-invariant by design, so pure permutations are sketch-identical
   and would manufacture 10-way simhash cliques (quadratic buckets).
   Salting changes the token multiset; near-dup pair counts stay
   ~linear in sf for every sketch family.
 - embeddings copy k: dimensions rotated by 7k (norms and value
   distribution preserved; cosine to any other copy ~uncorrelated)
 - events copy k: timestamps shifted by k * 100 days. Keeping the
   original timespan would multiply temporal DENSITY 10x and grow every
   time-window pair count ~100x — measuring data shape, not operators.

With --zipf (VERDICT r7 #6) the volume amplification is combined with
SKEW: sf1 scales 10x but keeps the distribution, so the operators'
guards (range-join est_pairs slicing, cellPairs triangle split, winnow
stop-fingerprints) never met production-shaped hot keys. The zipf
variant plants them deliberately, sized to SPLIT, not loud-fail:
 - events: user_id redrawn zipf-ish (log-uniform rank over 50k users:
   the hottest user carries ~9% of all events — the thundering-herd
   session/funnel shape), plus a 10k-event burst squeezed into ONE
   10-minute bucket of copy 0 (est_pairs ~1e8: above the 2^26
   pairs-per-task slicing threshold, far below the 1e9 loud-fail cap).
 - documents: copy 0 rows 10..159 become one 150-way exact-duplicate
   group (hot digest, hot minhash band, winnow df>64 stop-cap), and
   half of all sources collapse onto the hottest source value.
 - embeddings: 25% of vectors blended toward a per-copy hot direction
   (v' = 0.4*b + 0.6*v: mutual cosine ~0.3-0.7, far under the 0.99
   SemDeDup tau - skews cell geometry without manufacturing duplicate
   cliques).

--copies=N (default 10 = "sf1") scales further: N=30 is the sf3
rehearsal decade-and-a-half (VERDICT r14 #1 — measure the scaling
exponent past sf1). Key offsets stay collision-free up to N=99:
documents/embeddings ids reach N*100k < the +10M planted-twin offset.

Usage: python3 scripts/make_sf1.py [--zipf] [--copies=N] [outdir]
       (default outdir target/sf1, or target/sf1z with --zipf)
"""
import math
import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ZIPF = "--zipf" in sys.argv
COPIES = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
               if a.startswith("--copies=")), 10)
assert 1 <= COPIES <= 99, "key offsets are collision-free only to 99 copies"
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = _args[0] if _args else ("target/sf1z" if ZIPF else "target/sf1")

# table -> {column: per-copy key offset}
KEY_SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    # documents/embeddings ids stay far below the +10M planted-twin
    # offset the dedup gates add on top
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
AS_IS = ["region", "nation"]


def shifted(table: pa.Table, name: str, k: int) -> pa.Table:
    cols = []
    for field in table.schema:
        col = table[field.name]
        off = KEY_SHIFTS.get(name, {}).get(field.name)
        if off:
            col = pc.add(col, pa.scalar(k * off, type=field.type))
        cols.append(col)
    t = pa.table(cols, schema=table.schema)
    if name == "documents" and k > 0:
        rng = random.Random(k)
        texts = []
        for s in t["text"].to_pylist():
            toks = s.split()
            rng.shuffle(toks)
            toks = [w + f"x{k}" if i % 11 == 0 else w
                    for i, w in enumerate(toks)]
            texts.append(" ".join(toks))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, type=pa.string()))
        # n_chars IS length(text) — the reader canary asserts it
        # (Tables.documents); the salted copies must keep it true
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in texts], type=pa.int64()))
    if name == "events" and k > 0:
        # shift in the column's OWN unit (the driver's physical encoding
        # drifted nanos->micros between rounds; a hardcoded-nanos shift
        # applied to micros values lands copies millennia out)
        ts_type = t.schema.field("ts").type
        unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
        shift = k * 100 * 24 * 3600 * unit_per_s
        ts = pc.add(t["ts"].cast(pa.int64()), pa.scalar(shift))
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         ts.cast(ts_type))
    if name == "embeddings" and k > 0:
        r = (7 * k)
        vecs = [v[r % len(v):] + v[:r % len(v)] if v else v
                for v in t["embedding"].to_pylist()]
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(vecs, type=t.schema.field("embedding").type))
    if ZIPF:
        t = zipfify(t, name, k)
    return t


def zipfify(t: pa.Table, name: str, k: int) -> pa.Table:
    """Skew one amplified copy (see module docstring for the sizing)."""
    rng = random.Random(7000 + k)
    idx = t.schema.get_field_index
    if name == "events":
        n_users = 50_000
        base = k * KEY_SHIFTS["events"]["user_id"]
        log_n = math.log(n_users)
        uid = [base + int(math.exp(rng.uniform(0.0, log_n)))
               for _ in range(t.num_rows)]
        t = t.set_column(idx("user_id"), "user_id",
                         pa.array(uid, type=pa.int64()))
        if k == 0:
            ts_type = t.schema.field("ts").type
            unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6,
                          "ns": 10**9}[ts_type.unit]
            window = 600 * unit_per_s  # the range join's 10-min bucket
            ts = t["ts"].cast(pa.int64()).to_pylist()
            # burst base aligned DOWN to a bucket boundary so all 10k
            # rows land in ONE bucket (offsets strictly < window)
            t0 = (min(ts) // window) * window + window  # next full bucket
            for i in range(min(10_000, len(ts))):
                ts[i] = t0 + (i * 37_647) % (window - 1)
            t = t.set_column(idx("ts"), "ts",
                             pa.array(ts, type=pa.int64()).cast(ts_type))
    if name == "documents":
        srcs = t["source"].to_pylist()
        hot_src = max(set(srcs), key=srcs.count)
        srcs = [hot_src if rng.random() < 0.5 else s for s in srcs]
        t = t.set_column(idx("source"), "source",
                         pa.array(srcs, type=pa.string()))
        if k == 0:
            texts = t["text"].to_pylist()
            n_chars = t["n_chars"].to_pylist()
            if len(texts) > 160:
                for i in range(10, 160):  # 150-way exact-dup group
                    texts[i] = texts[10]
                    n_chars[i] = n_chars[10]
            t = t.set_column(idx("text"), "text",
                             pa.array(texts, type=pa.string()))
            t = t.set_column(idx("n_chars"), "n_chars",
                             pa.array(n_chars, type=pa.int64()))
    if name == "embeddings":
        vecs = t["embedding"].to_pylist()
        hot = vecs[0]
        vecs = [[0.4 * b + 0.6 * x for b, x in zip(hot, v)]
                if v and rng.random() < 0.25 else v for v in vecs]
        t = t.set_column(idx("embedding"), "embedding",
                         pa.array(vecs, type=t.schema.field("embedding").type))
    return t


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in AS_IS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} rows (as-is)")
    for name in KEY_SHIFTS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        out = pa.concat_tables([shifted(src, name, k) for k in range(COPIES)])
        pq.write_table(out, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
