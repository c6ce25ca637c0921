"""Connected-components scale probe: min-label propagation vs
large/small-star on three 10^5..10^6-edge graph shapes.

The dedupe pipelines end in clustering; the pair graph's SHAPE decides
which algorithm is safe. This probe evidences the tradeoff at scale
(deterministic synthetic graphs, no external data):

- `cliques`: 500k nodes in 125k clusters of 4 — the near-dup shape
  (tiny diameter). Both algorithms are correct; label is cheaper per
  round, so it's the default.
- `chain`: a 100k-node path (diameter 10^5) — the adversarial shape.
  Label at its 25-round cap silently under-merges (measured below);
  star closes it in O(log^2 n) rounds.
- `random`: 500k nodes, 1M uniform edges (supercritical: giant component,
  diameter ~log n) — label needs ~diameter rounds, star stays flat.

Results land in BENCH/CC_PROBE.md.
Usage: python tools/cc_probe.py [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bento_spark.operators.dedupe_fuzzy import (
    connected_components,
    connected_components_star,
)
from bento_spark.session import get_spark

OUT_MD = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "CC_PROBE.md"
)


def graphs(spark):
    # cliques: nodes 4k..4k+3 chained (path of 4 per cluster)
    cliques = (
        spark.range(500_000)
        .filter(F.col("id") % 4 != 3)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    chain = spark.range(99_999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # random: xxhash64-derived endpoints — deterministic, uniform
    rnd = spark.range(1_000_000).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(500_000)).alias("id_a"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(500_000)).alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    return {"cliques": cliques, "chain": chain, "random": rnd}


def run(algo_name, fn, pairs):
    t0 = time.time()
    out = fn(pairs)
    n_nodes = out.count()
    n_clusters = out.select("cluster_id").distinct().count()
    return {
        "algo": algo_name,
        "sec": round(time.time() - t0, 2),
        "nodes": n_nodes,
        "clusters": n_clusters,
    }


def main() -> None:
    spark = get_spark(app_name="cc-probe")
    lines = [
        "# Connected-components probe: label vs star at 10^5-10^6 edges",
        "",
        "Deterministic synthetic graphs (tools/cc_probe.py). `label` ="
        " min-label propagation (25-round cap), `star` = large/small-star.",
        "",
        "| graph | edges | algo | sec | nodes | clusters | expected |",
        "|---|---|---|---|---|---|---|",
    ]
    expect = {"cliques": 125_000, "chain": 1, "random": None}
    notes = []  # interpretation lines appended AFTER the table
    for shape, pairs in graphs(spark).items():
        pairs = pairs.persist()
        n_edges = pairs.count()
        rows = []
        for algo_name, fn in (("label", connected_components), ("star", connected_components_star)):
            r = run(algo_name, fn, pairs)
            rows.append(r)
            exp = expect[shape]
            exp_s = str(exp) if exp is not None else "(agree)"
            lines.append(
                f"| {shape} | {n_edges} | {r['algo']} | {r['sec']} | "
                f"{r['nodes']} | {r['clusters']} | {exp_s} |"
            )
            print(lines[-1], flush=True)
        pairs.unpersist()
        if shape == "chain":
            label_c, star_c = rows[0]["clusters"], rows[1]["clusters"]
            notes.append(
                f"- chain: label under-merges at its round cap ({label_c} clusters"
                f" instead of 1 — each round closes one hop of a 10^5-hop path);"
                f" star converges to {star_c}. This is WHY star exists as"
                f" `dedupe_clusters(algo='star')`."
            )
        if shape == "random":
            agree = rows[0]["clusters"] == rows[1]["clusters"]
            ratio = round(rows[0]["sec"] / max(rows[1]["sec"], 1e-9), 1)
            notes.append(
                f"- random: label and star {'agree' if agree else 'DISAGREE'} on "
                f"{rows[1]['clusters']} components; star is {ratio}x faster — the"
                f" giant component's diameter keeps label iterating while star's"
                f" round count stays O(log^2 n)."
            )
    lines += [""] + notes
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    main()
