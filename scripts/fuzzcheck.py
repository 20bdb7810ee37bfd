#!/usr/bin/env python3
"""Fuzzed-fixture parity gate (round-7 verdict #6).

Every registered query/oracle pair is proven on ONE fixed driver dataset; the
Spark<->DuckDB parity rules (casts, regex dialect, decimal folds,
row-sort hashing — see Common.scala and scripts/check.py) could in
principle hold on that fixture by accident. This gate regenerates every
harness table SCHEMA-COMPATIBLY from a seeded RNG — same columns, same
physical parquet types (timestamp[ns] events, timestamp[ms] dates,
list<float>[64] embeddings, int32 vs int64 widths), same value domains
(event_type/lang/source/flags/priorities vocabularies), different
values — then runs the FULL Verify dump + check.py compare on it.

Usage:  python3 scripts/fuzzcheck.py --seed 1 [--outdir /tmp/fuzz]
        for s in 1 2 3; do python3 scripts/fuzzcheck.py --seed $s; done

Deliberate data properties (in-contract fuzzing):
  - timestamps are UNIQUE per table at nanosecond resolution: the as-of
    merge and DuckDB ASOF JOIN are both engine-arbitrary on exactly-tied
    build timestamps, and SCD-2 versioning on sub-microsecond ties is
    documented out of contract (ScanOps.scd2);
  - no NULLs in key/ts columns (harness tables have none either; null
    as-of/join semantics are covered by unit specs);
  - FK-ish references stay in range so joins produce rows (an all-miss
    join would green-light trivially on 0=0 rows).
"""
import argparse, os, shutil, subprocess, sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = ("the fast key order sort table scan merge part window small hash "
         "join batch stream spark dup group query row data slow filter "
         "customer line value agg column big a vector").split()
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
LANGS = ["de", "zh", "fr", "es", "en"]
SOURCES = [f"src{i}" for i in range(20)]
SEGMENTS = ["BUILDING", "AUTOMOBILE", "HOUSEHOLD", "MACHINERY", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "PROMO", "STANDARD", "LARGE", "SMALL"]
PNOUNS = ["widget", "bolt", "gear", "case", "tube"]
PADJS = ["cold", "small", "large", "dim", "hot"]


def write(df, path, schema=None, **kw):
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(tbl, path, **kw)


def gen(seed: int, out: str):
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    # region / nation (fixed-shape dims, int32 keys)
    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": [f"REGION{i}" for i in range(5)]})
    write(region, f"{out}/region.parquet")
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION{i}" for i in range(25)],
        "n_regionkey": rng.integers(0, 5, 25).astype(np.int32)})
    write(nation, f"{out}/nation.parquet")

    customer = pd.DataFrame({
        "c_custkey": np.arange(150, dtype=np.int64),
        "c_name": [f"Customer#{i}" for i in range(150)],
        "c_nationkey": rng.integers(0, 25, 150).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, 150), 2),
        "c_mktsegment": rng.choice(SEGMENTS, 150)})
    write(customer, f"{out}/customer.parquet")

    supplier = pd.DataFrame({
        "s_suppkey": np.arange(10, dtype=np.int64),
        "s_name": [f"Supplier#{i}" for i in range(10)],
        "s_nationkey": rng.integers(0, 25, 10).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, 10), 2)})
    write(supplier, f"{out}/supplier.parquet")

    part = pd.DataFrame({
        "p_partkey": np.arange(200, dtype=np.int64),
        "p_name": [f"{rng.choice(PADJS)} {rng.choice(PNOUNS)}" for _ in range(200)],
        "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(200)],
        "p_type": rng.choice(PTYPES, 200),
        "p_size": rng.integers(1, 51, 200).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, 200), 2)})
    write(part, f"{out}/part.parquet")

    n_orders = 1500
    odate = (pd.Timestamp("1995-01-01")
             + pd.to_timedelta(rng.integers(0, 2400, n_orders), unit="D"))
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, 150, n_orders).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_orders),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_orders), 2),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(PRIORITIES, n_orders)})
    write(orders, f"{out}/orders.parquet", coerce_timestamps="ms")

    n_li = 6000
    lkey = rng.integers(0, n_orders, n_li).astype(np.int64)
    lineitem = pd.DataFrame({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, 200, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, 10, n_li).astype(np.int64),
        "l_linenumber": (rng.integers(1, 8, n_li)).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["R", "A", "N"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": (pd.Timestamp("1995-01-02")
                       + pd.to_timedelta(rng.integers(0, 2500, n_li), unit="D"))})
    write(lineitem, f"{out}/lineitem.parquet", coerce_timestamps="ms")

    # events: timestamp[ns] (Spark side reads via nanosAsLong), UNIQUE ts
    n_ev = 1000
    base = pd.Timestamp("2024-01-01").value
    # sorted unique nanos across ~30 days; +row index guarantees uniqueness
    ts_ns = np.sort(rng.integers(0, 30 * 86400 * 10**9, n_ev, dtype=np.int64))
    ts_ns = base + ts_ns + np.arange(n_ev)
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.to_datetime(ts_ns),
        "user_id": rng.integers(0, 15, n_ev).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, n_ev, p=[.1, .4, .2, .1, .2]),
        "value": np.round(rng.uniform(0, 330, n_ev), 2),
        "props": [f'{{"k": {rng.integers(0, 100)}}}' for _ in range(n_ev)]})
    write(events, f"{out}/events.parquet",
          coerce_timestamps=None, version="2.6")

    # documents: word-salad text over the shared vocab; some near-dups so
    # the dedup family has real work (clone a doc then perturb a word)
    n_doc = 500
    texts = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.15:  # near-duplicate of an earlier doc
            w = texts[rng.integers(0, i)].split()
            j = rng.integers(0, len(w))
            w[j] = rng.choice(WORDS)
            texts.append(" ".join(w))
        else:
            texts.append(" ".join(rng.choice(WORDS, rng.integers(20, 120))))
    documents = pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc),
        "source": rng.choice(SOURCES, n_doc),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    write(documents, f"{out}/documents.parquet")

    # embeddings: list<float>[64] with a few exact/near duplicates
    n_vec = 500
    emb = rng.normal(0, 1, (n_vec, 64)).astype(np.float32)
    for _ in range(25):
        a, b = rng.integers(0, n_vec, 2)
        emb[a] = emb[b] + rng.normal(0, 0.01, 64).astype(np.float32)
    embeddings = pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": [e for e in emb],
        "label": rng.integers(0, 10, n_vec).astype(np.int32)})
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32())])
    write(embeddings, f"{out}/embeddings.parquet", schema=schema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()
    data = args.outdir or f"/tmp/fuzz_data_{args.seed}"
    dump = f"/tmp/fuzz_verify_{args.seed}"
    shutil.rmtree(data, ignore_errors=True)
    shutil.rmtree(dump, ignore_errors=True)
    gen(args.seed, data)
    print(f"[fuzzcheck] seed={args.seed} fixture at {data}")
    if args.gen_only:
        return
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {data} {dump}"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    if r.returncode != 0:
        sys.stdout.buffer.write(r.stdout[-4000:])
        sys.exit(f"[fuzzcheck] Verify FAILED (seed={args.seed})")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check.py"), data, dump])
    if r.returncode != 0:
        sys.exit(f"[fuzzcheck] parity FAILED (seed={args.seed})")
    print(f"[fuzzcheck] seed={args.seed} ALL GREEN")


if __name__ == "__main__":
    main()
