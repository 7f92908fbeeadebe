#!/usr/bin/env python
"""sf1 scale rehearsal (VERDICT r9 item 4): a plain 10× end-to-end run of
the bench heavy tail, on top of the flood experiments that proved
specific degeneracies.

`gen` synthesizes a deterministic sf1 (~10× sf0.1) into --out by
replicating the driver's sf0.1 tables with structure-preserving
perturbations (the driver testdata itself is read-only and tops out at
sf0.1; this data is REHEARSAL-ONLY — the correctness gate and bench
still run exclusively on the driver's parquet):

* documents ×10 — doc_id offset per replica; replica texts get a marker
  token spliced every 10 words so cross-replica pairs fall well below
  near-dup thresholds (plain replication would turn every doc into a
  10-member dup cluster and measure a 45× pair blowup, not a 10× corpus);
  within-replica dup topology is preserved exactly.
* embeddings ×10 — vec_id offset, deterministic N(0, 0.02) jitter per
  replica (seeded), labels kept.
* events ×10 — event_id offset (building_match's rect grid grows
  naturally since rect layout derives from event_id).
* lineitem/orders ×10 with consistent orderkey offsets; dims copied.

`run` times each heavy-tail query at sf0.1 and sf1, audits the sf1 plan
(no cartesian products; join/exchange/python counts recorded at both
sizes so a plan-shape flip is visible), and prints the PLANS.md table.

`sweep` builds (without fully executing) every non-osm registry query's
physical plan at sf0.1 and sf1 and reports shape diffs — a plan flip
between sizes is a size-driven planning decision worth eyeballing.

`bcast` walks every BroadcastExchange subtree at sf1 (AQE off so the
tree is walkable) and flags broadcasts of unbounded fact-table lineage.
Interpretation rule (PLANS.md r10): flags over raw narrow scans are
usually fine (the size estimate is accurate, so Catalyst falls back by
itself at scale); the misplan class is WIDTH-BLIND estimates — arrays/
structs synthesized between scan and join, or post-Python frames.

Usage:
  python scripts/scale_rehearsal.py gen   [--out /tmp/sf1]
  python scripts/scale_rehearsal.py run   [--sf1 /tmp/sf1] [--queries a,b]
  python scripts/scale_rehearsal.py sweep [--sf1 /tmp/sf1]
  python scripts/scale_rehearsal.py bcast [--sf1 /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10

# the bench heavy tail with a real scale axis (osm_* queries are
# fixture-driven — no scale knob — so they are not in the rehearsal)
HEAVY_TAIL = [
    "building_match_support",
    "building_match_volume",
    "building_match",
    "semdedup_prune",
    "knn_ivfpq",
    "ann_recall_pq",
    "neardup_dedup_app",
    "dedup_components",
    "split_contamination_report",
    "split_leakage_safe",
    "doc_lr_quality",
]


def _splice_marker(text: str, k: int) -> str:
    if not text:
        return text
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        if i and i % 10 == 0:
            out.append(f"zrep{k}z")
        out.append(w)
    return " ".join(out)


def gen(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    # dims: copy verbatim
    for t in ("region", "nation", "customer", "supplier", "part"):
        pq.write_table(
            pq.read_table(os.path.join(SF01, f"{t}.parquet")),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    # documents: id offset + marker splice per replica
    docs = pq.read_table(os.path.join(SF01, "documents.parquet"))
    n_docs = docs.num_rows
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    batches = []
    for k in range(REPLICAS):
        t = docs
        new_ids = pa.array([i + k * n_docs for i in ids], type=pa.int64())
        if k == 0:
            new_texts = docs.column("text")
        else:
            new_texts = pa.array(
                [None if s is None else _splice_marker(s, k) for s in texts]
            )
        t = t.set_column(0, "doc_id", new_ids).set_column(1, "text", new_texts)
        if k > 0:
            # n_chars tracks the perturbed text; replica 0 keeps the
            # driver's original values verbatim
            t = t.set_column(
                4,
                "n_chars",
                pa.array(
                    [0 if s is None else len(s) for s in new_texts.to_pylist()],
                    type=pa.int64(),
                ),
            )
        batches.append(t)
    pq.write_table(pa.concat_tables(batches), os.path.join(out_dir, "documents.parquet"))

    # embeddings: id offset + seeded jitter
    emb = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
    n_emb = emb.num_rows
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    vids = emb.column("vec_id").to_pylist()
    parts = []
    for k in range(REPLICAS):
        rng = np.random.default_rng(1000 + k)
        jittered = vecs if k == 0 else vecs + rng.normal(0, 0.02, vecs.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array([v + k * n_emb for v in vids], type=pa.int64()),
                    "embedding": pa.array(jittered.tolist(), type=pa.list_(pa.float32())),
                    "label": emb.column("label"),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "embeddings.parquet"))

    # events / orders / lineitem: key offsets
    ev = pq.read_table(os.path.join(SF01, "events.parquet"))
    n_ev = ev.num_rows
    eids = ev.column("event_id").to_pylist()
    parts = [
        ev.set_column(
            0, "event_id", pa.array([e + k * n_ev for e in eids], type=pa.int64())
        )
        for k in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "events.parquet"))

    orders = pq.read_table(os.path.join(SF01, "orders.parquet"))
    okey_max = max(orders.column("o_orderkey").to_pylist()) + 1
    okeys = orders.column("o_orderkey").to_pylist()
    parts = [
        orders.set_column(
            0, "o_orderkey", pa.array([o + k * okey_max for o in okeys], type=pa.int64())
        )
        for k in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "orders.parquet"))

    li = pq.read_table(os.path.join(SF01, "lineitem.parquet"))
    lkeys = li.column("l_orderkey").to_pylist()
    parts = [
        li.set_column(
            0, "l_orderkey", pa.array([o + k * okey_max for o in lkeys], type=pa.int64())
        )
        for k in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "lineitem.parquet"))
    print(f"sf1 written to {out_dir}: docs={n_docs * REPLICAS} emb={n_emb * REPLICAS} "
          f"events={n_ev * REPLICAS} lineitem={li.num_rows * REPLICAS}")


def run(sf1_dir: str, names: list[str]) -> None:
    from pyspark.sql import SparkSession

    from osmesa_spark import queries as Q
    from osmesa_spark.plans import audit_plan

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    rows = []
    for name in names:
        q = reg[name].spark
        rec = {"name": name}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
            timings = []
            runs = 2 if label == "sf0.1" else 1
            for _ in range(runs):
                t0 = time.monotonic()
                df = q(spark, sf_dir)
                cnt = df.count()
                timings.append(time.monotonic() - t0)
            a = audit_plan(q(spark, sf_dir))
            rec[label] = min(timings)
            rec[f"{label}_rows"] = cnt
            rec[f"{label}_shape"] = (
                f"bj={a.broadcast_joins} smj={a.sort_merge_joins} "
                f"shj={a.shuffled_hash_joins} cart={a.cartesian_products} "
                f"ex={a.exchanges} py={a.python_stages} "
                f"uw={len(a.unpartitioned_window_lines)}"
            )
            assert a.cartesian_products == 0, f"{name}@{label}: cartesian!"
        rec["ratio"] = rec["sf1"] / max(rec["sf0.1"], 1e-9)
        rows.append(rec)
        print(
            f"{name}: sf0.1={rec['sf0.1']:.2f}s ({rec['sf0.1_rows']} rows, "
            f"{rec['sf0.1_shape']}) -> sf1={rec['sf1']:.2f}s "
            f"({rec['sf1_rows']} rows, {rec['sf1_shape']}) ratio={rec['ratio']:.1f}x",
            flush=True,
        )
    print("\n| query | sf0.1 s | sf1 s | ratio | sf1 rows | sf1 plan |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['name']} | {r['sf0.1']:.2f} | {r['sf1']:.2f} | "
            f"{r['ratio']:.1f}x | {r['sf1_rows']} | {r['sf1_shape']} |"
        )


def _session(extra: dict | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def sweep(sf1_dir: str) -> None:
    from osmesa_spark import queries as Q
    from osmesa_spark.plans import audit_plan

    spark = _session()
    reg = Q.registry()
    flips, errs, same = [], [], 0
    for name, spec in reg.items():
        if name.startswith("osm_"):
            continue
        try:
            def shape(sf):
                a = audit_plan(spec.spark(spark, sf))
                return (a.broadcast_joins, a.sort_merge_joins,
                        a.shuffled_hash_joins, a.cartesian_products,
                        a.python_stages, len(a.unpartitioned_window_lines))
            s01, s1 = shape(SF01), shape(sf1_dir)
            assert s1[3] == 0, f"{name}: cartesian at sf1"
            if s01 != s1:
                flips.append((name, s01, s1))
                print(f"FLIP {name}: {s01} -> {s1}", flush=True)
            else:
                same += 1
        except Exception as e:
            errs.append(name)
            print(f"ERR {name}: {str(e)[:80]}", flush=True)
    print(f"identical: {same}, flips: {len(flips)}, errors: {len(errs)} "
          "(shape = bj,smj,shj,cart,py,uw)")


def bcast(sf1_dir: str) -> None:
    from osmesa_spark import queries as Q

    spark = _session({"spark.sql.adaptive.enabled": "false"})
    reg = Q.registry()
    facts = ("documents", "embeddings", "events", "lineitem", "orders")

    def flags_for(df):
        root = df._jdf.queryExecution().executedPlan()
        flags = []

        def walk(node):
            if "BroadcastExchange" in node.nodeName():
                info = {"leaf": None, "bounded": False}

                def inner(n):
                    nn = n.nodeName()
                    s0 = n.toString().split("\n")[0]
                    if ("Aggregate" in nn or "Limit" in nn
                            or "Deduplicate" in nn or "LocalTableScan" in nn):
                        info["bounded"] = True
                        return
                    if ("Scan" in nn or "ReusedExchange" in nn) and any(
                        f in s0 for f in facts
                    ):
                        info["leaf"] = s0[:90]
                    for i in range(n.children().size()):
                        inner(n.children().apply(i))

                inner(node)
                if info["leaf"] and not info["bounded"]:
                    flags.append(info["leaf"])
                return
            for i in range(node.children().size()):
                walk(node.children().apply(i))

        walk(root)
        return flags

    n_flagged = 0
    for name, spec in reg.items():
        if name.startswith("osm_"):
            continue
        try:
            fl = flags_for(spec.spark(spark, sf1_dir))
            if fl:
                n_flagged += 1
                print(f"FLAG {name}: {fl}", flush=True)
        except Exception as e:
            print(f"ERR {name}: {str(e)[:80]}", flush=True)
    print(f"done; flagged {n_flagged} (apply the pin-vs-trust rule from "
          "PLANS.md before changing anything)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "run", "sweep", "bcast"])
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--queries", default=",".join(HEAVY_TAIL))
    args = ap.parse_args()
    if args.cmd == "gen":
        gen(args.out)
    elif args.cmd == "sweep":
        sweep(args.sf1)
    elif args.cmd == "bcast":
        bcast(args.sf1)
    else:
        run(args.sf1, [n for n in args.queries.split(",") if n])
