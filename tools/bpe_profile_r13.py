"""Round-13 phase profile for bpe_train (VERDICT r12 item 4).

Replays the trainer's loop with per-round timers so the two jobs each
round runs — the pair-count aggregate feeding the driver argmax, and
the merge-fold localCheckpoint — are timed separately, together with
the quantities that decide whether per-round input shrinkage can pay:
vocabulary rows, rows holding the just-merged pair ("affected"), and
exploded-pair rows. The loop body mirrors operators/text.py:bpe_train
at the registry's knobs (n_merges=12, min_freq=2) — measurement only,
never a second implementation the engine runs.

Usage::

    python tools/bpe_profile_r13.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bpe-profile-r13")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    t0 = time.perf_counter()
    words = (
        docs.select(F.explode(F.split(F.col("text"), " +")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.expr("regexp_extract_all(word, '.', 0)"),
                F.array(F.lit("</w>")),
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    n_vocab = words.count()
    print(f"vocab build: {time.perf_counter() - t0:.3f}s  rows={n_vocab}")

    for it in range(12):
        t0 = time.perf_counter()
        pair_counts = (
            words.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(
                F.col("pair_freq").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        t_agg = time.perf_counter() - t0
        if not pair_counts or pair_counts[0]["pair_freq"] < 2:
            break
        left, right = pair_counts[0]["l"], pair_counts[0]["r"]
        merged = left + right

        # diagnostics: exploded-pair volume + affected-word count
        t0 = time.perf_counter()
        n = F.size("syms")
        hit = F.exists(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda a, b: (a == F.lit(left)) & (b == F.lit(right)),
            ),
            lambda p: p,
        )
        stats = words.agg(
            F.sum(F.greatest(n - 1, F.lit(0))).alias("pair_rows"),
            F.count_if(hit).alias("affected"),
            F.count("*").alias("vocab"),
        ).collect()[0]
        t_stats = time.perf_counter() - t0

        def make_fold(_l: str, _r: str, _m: str):
            def fold(acc, x):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_l))
                    & (x == F.lit(_r)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(_m)),
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return fold

        fold = make_fold(left, right, merged)
        t0 = time.perf_counter()
        words = words.select(
            F.aggregate(
                "syms", F.array().cast("array<string>"), fold
            ).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
        t_fold = time.perf_counter() - t0
        print(
            f"round {it + 1:2d}: pair=({left!r},{right!r})"
            f"  agg+argmax={t_agg:.3f}s  fold+ckpt={t_fold:.3f}s"
            f"  [stats {t_stats:.3f}s: vocab={stats['vocab']}"
            f" pair_rows={stats['pair_rows']}"
            f" affected={stats['affected']}"
            f" ({100.0 * stats['affected'] / stats['vocab']:.1f}%)]"
        )

    spark.stop()


if __name__ == "__main__":
    main()
