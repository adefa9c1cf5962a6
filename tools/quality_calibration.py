"""Calibration sweep for the trainable quality classifier.

``quality_filter``'s hard-threshold policy needs an operating point; this
tool records one. It fits ``quality_fit`` on a labeled TRAIN split,
sweeps the keep-threshold over a held-out split, and prints ONE JSON
line with precision / recall / F1 per threshold plus the F1-argmax.

Default corpus: a deterministic synthetic labeled set (seeded RNG) in
the style the classifier is built for — a "seed quality" distribution
(sentence-shaped text over a common-English vocabulary, stopword-rich)
against a reject distribution (token salad, boilerplate repetition,
junk punctuation), with a shared vocabulary fraction so the classes
OVERLAP and the sweep is non-trivial. Pass ``--labeled <parquet>``
(columns: text, label — override with --text-col/--label-col) to
calibrate on a real corpus instead; the synthetic default exists so the
round artifact is reproducible with no external data.

Chosen default threshold: 0.5 ships in ``quality_filter`` because on
every synthetic calibration run the F1 curve is FLAT within noise across
[0.2, 0.8] (the classes the hashing-TF + logistic model separates, it
separates hard — scores pile up near 0 and 1), so the midpoint is the
stable choice; a real corpus with genuinely ambiguous documents should
ship the F1-argmax this tool reports instead.

Usage: python tools/quality_calibration.py [--labeled path]
       [--text-col text] [--label-col label] [--out path.json]
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, "/root/repo")

STOPWORDS = (
    "the of and to in a is that it for on with as are was at by an be "
    "this from or had not but what all were when we there can"
).split()
CONTENT = (
    "model language data learning training document quality corpus "
    "research analysis method system result study evidence measure "
    "process theory structure pattern example feature signal value"
).split()
JUNK = (
    "zxq wvv kpr qqj xoxo blort gnnn spam buy now click free winner "
    "deal offer http www casino pills cheap viagra limited"
).split()


def _good_doc(rng: random.Random) -> str:
    # sentence-shaped: stopword-heavy with content words, terminal period
    out = []
    for _ in range(rng.randint(3, 6)):
        n = rng.randint(6, 14)
        words = [
            rng.choice(STOPWORDS) if rng.random() < 0.45 else rng.choice(CONTENT)
            for _ in range(n)
        ]
        words[0] = words[0].capitalize()
        out.append(" ".join(words) + ".")
    return " ".join(out)


def _bad_doc(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.4:  # token salad with some shared vocabulary (overlap!)
        pool = JUNK + CONTENT[:8]
        return " ".join(rng.choice(pool) for _ in range(rng.randint(15, 40)))
    if kind < 0.7:  # boilerplate repetition
        phrase = " ".join(rng.choice(JUNK) for _ in range(4))
        return " ".join([phrase] * rng.randint(4, 9))
    # junk punctuation / shouting
    return " ".join(
        rng.choice(JUNK).upper() + "!!!" for _ in range(rng.randint(8, 20))
    )


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default=None):
        return args[args.index(name) + 1] if name in args else default

    from pyspark.sql import functions as F

    from rtstore_spark.engine import get_spark
    from rtstore_spark.operators.quality_classifier import quality_fit, quality_score

    spark = get_spark("quality_calibration")
    spark.sparkContext.setLogLevel("ERROR")

    labeled_path = _opt("--labeled")
    text_col = _opt("--text-col", "text")
    label_col = _opt("--label-col", "label")
    if labeled_path:
        labeled = spark.read.parquet(labeled_path).select(
            F.col(text_col).alias("text"),
            F.col(label_col).cast("double").alias("label"),
        )
        source = labeled_path
    else:
        rng = random.Random(20260815)
        rows = [(_good_doc(rng), 1.0) for _ in range(600)] + [
            (_bad_doc(rng), 0.0) for _ in range(600)
        ]
        labeled = spark.createDataFrame(rows, "text string, label double")
        source = "synthetic-v1 (seeded)"

    train, held = labeled.randomSplit([0.7, 0.3], seed=7)
    model = quality_fit(train, text_col="text", label_col="label")
    scored = quality_score(model, held).select("label", "quality_prob").cache()
    n_held = scored.count()

    sweep = []
    for t in [i / 20 for i in range(1, 20)]:
        row = scored.agg(
            F.sum(((F.col("quality_prob") >= t) & (F.col("label") == 1.0))
                  .cast("long")).alias("tp"),
            F.sum(((F.col("quality_prob") >= t) & (F.col("label") == 0.0))
                  .cast("long")).alias("fp"),
            F.sum(((F.col("quality_prob") < t) & (F.col("label") == 1.0))
                  .cast("long")).alias("fn"),
        ).collect()[0]
        tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
        prec = tp / (tp + fp) if tp + fp else 1.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        sweep.append({
            "threshold": t, "precision": round(prec, 4),
            "recall": round(rec, 4), "f1": round(f1, 4),
        })
    best = max(sweep, key=lambda r: r["f1"])
    result = {
        "metric": "quality_threshold_sweep",
        "source": source,
        "held_out_docs": int(n_held),
        "sweep": sweep,
        "best": best,
        "shipped_default": 0.5,
    }
    out = _opt("--out")
    line = json.dumps(result)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
