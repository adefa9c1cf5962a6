"""Calibration sweep for the trainable quality classifier.

``quality_filter``'s hard-threshold policy needs an operating point; this
tool records one. It fits ``quality_fit`` on a labeled TRAIN split,
sweeps the keep-threshold over a held-out split, and prints ONE JSON
line with precision / recall / F1 per threshold plus the F1-argmax.

Default corpus (synthetic-v2, seeded): the round-7 v1 split saturated —
precision = recall = 1.0 at every threshold ≤ 0.5, so the sweep carried
no information about where to put the operating point. v2 adds a
BOUNDARY CONTINUUM the model genuinely cannot separate: good documents
progressively contaminated with junk vocabulary (label flips at 30%
contamination — docs near the cut are ambiguous BY CONSTRUCTION),
truncations of good docs (severe cuts are rejects, light cuts keep
their label), and good docs with boilerplate tails of varying length.
Scores spread over the unit interval, the precision/recall trade-off is
real, and the F1 curve bends. Pass ``--labeled <parquet>`` (columns:
text, label — override with --text-col/--label-col) to calibrate on a
real corpus instead; the synthetic default exists so the round artifact
is reproducible with no external data.

Operating-point policy, recorded in the artifact: the shipped default
is the sweep's F1-argmax UNLESS a lower threshold holds precision above
the 0.95 floor with materially better recall (corpus prep prefers
keeping borderline docs when the cost is bounded contamination —
downstream dedup/decontamination stages catch what slips through).

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


def _boundary_docs(rng: random.Random, n: int) -> list[tuple[str, float]]:
    """Docs that STRADDLE the decision boundary, labeled by construction.

    Three families, each a continuum the hashing-TF + logistic model
    cannot cleanly separate (word-distribution evidence varies smoothly
    with the corruption level, so scores spread instead of piling at
    0/1):
      a) contamination — a good doc with a uniform fraction of its words
         replaced by junk vocabulary; label flips at 30% replaced.
      b) truncation — a good doc cut mid-sentence; cuts keeping <35% of
         the words are rejects, lighter cuts keep the good label.
      c) boilerplate tail — a good doc with a repeated junk phrase
         appended; label flips when the tail exceeds 60% of the body.
    """
    out: list[tuple[str, float]] = []
    for i in range(n):
        fam = i % 3
        words = _good_doc(rng).split()
        if fam == 0:
            frac = rng.uniform(0.05, 0.55)
            k = max(1, int(len(words) * frac))
            for p in rng.sample(range(len(words)), k):
                words[p] = rng.choice(JUNK)
            out.append((" ".join(words), 1.0 if frac < 0.30 else 0.0))
        elif fam == 1:
            keep = rng.uniform(0.15, 0.75)
            cut = max(3, int(len(words) * keep))
            out.append((" ".join(words[:cut]), 1.0 if keep >= 0.35 else 0.0))
        else:
            phrase = " ".join(rng.choice(JUNK) for _ in range(3))
            tail_frac = rng.uniform(0.2, 1.2)
            reps = max(1, int(len(words) * tail_frac) // 3)
            doc = " ".join(words) + " " + " ".join([phrase] * reps)
            out.append((doc, 1.0 if tail_frac < 0.60 else 0.0))
    return out


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
        rows = (
            [(_good_doc(rng), 1.0) for _ in range(600)]
            + [(_bad_doc(rng), 0.0) for _ in range(600)]
            + _boundary_docs(rng, 900)
        )
        labeled = spark.createDataFrame(rows, "text string, label double")
        source = "synthetic-v2 (seeded; 900 boundary-continuum docs)"

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
    # documented operating-point policy (module docstring): F1-argmax,
    # unless a LOWER threshold keeps precision >= 0.95 with better
    # recall — prefer keeping borderline docs when contamination stays
    # bounded (downstream dedup/decontamination catches the slip)
    floor_picks = [
        r for r in sweep
        if r["precision"] >= 0.95 and r["threshold"] < best["threshold"]
        and r["recall"] > best["recall"]
    ]
    chosen = min(floor_picks, key=lambda r: r["threshold"]) if floor_picks else best
    result = {
        "metric": "quality_threshold_sweep",
        "source": source,
        "held_out_docs": int(n_held),
        "sweep": sweep,
        "best": best,
        "chosen": chosen,
        "policy": "f1-argmax unless a lower threshold holds precision>=0.95 "
                  "with higher recall",
        "f1_spread": round(
            max(r["f1"] for r in sweep) - min(r["f1"] for r in sweep), 4
        ),
    }
    from rtstore_spark.operators.quality_classifier import (
        DEFAULT_KEEP_THRESHOLD,
    )

    result["shipped_default"] = DEFAULT_KEEP_THRESHOLD
    out = _opt("--out")
    line = json.dumps(result)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
