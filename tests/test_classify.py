"""Linear text classifier: scoring exactness, training convergence,
partitioning determinism."""

import pytest
from pyspark.sql import Row

from kartothek_spark.functions.hashing import H60_MAX
from kartothek_spark.operators.classify import (
    score_documents,
    train_text_classifier,
)


def _hand_score(text, weights_micro, bias):
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    s = bias
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        s += weights_micro[h % len(weights_micro)]
    return s


def test_score_documents_exact_vs_hand_computed(spark):
    weights = [((i * 40503) % 2001) - 1000 for i in range(64)]
    rows = [
        Row(doc_id=1, text="Spark table JOIN engine"),
        Row(doc_id=2, text="completely different words here"),
        Row(doc_id=3, text=""),  # empty doc: bias only
    ]
    out = {
        r.doc_id: (r.score_micro, r.predicted)
        for r in score_documents(spark.createDataFrame(rows), weights, bias_micro=137).collect()
    }
    for r in rows:
        exp = _hand_score(r.text, weights, 137)
        assert out[r.doc_id] == (exp, exp > 0), r.doc_id
    # determinism under repartitioning (integer sums are exact)
    df = spark.createDataFrame(rows)
    a = sorted(tuple(r) for r in score_documents(df, weights, 137).collect())
    b = sorted(tuple(r) for r in score_documents(df.repartition(7), weights, 137).collect())
    assert a == b


def test_train_separates_planted_classes(spark):
    rows = []
    for i in range(40):
        rows.append(Row(doc_id=i, text="excellent wonderful prose " * 3, label=1))
        rows.append(Row(doc_id=100 + i, text="spam junk garbage " * 3, label=0))
    df = spark.createDataFrame(rows)
    w, b = train_text_classifier(
        df, "label", n_features=128, iters=12, lr=1.0, id_col="doc_id"
    )
    scored = {r.doc_id: r.predicted for r in score_documents(df, w, b).collect()}
    assert all(scored[i] for i in range(40))
    assert not any(scored[100 + i] for i in range(40))
    # deterministic training under repartitioning
    w2, b2 = train_text_classifier(
        df.repartition(9), "label", n_features=128, iters=12, lr=1.0, id_col="doc_id"
    )
    assert (w, b) == (w2, b2)


def test_train_validations(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x", label=1)])
    with pytest.raises(ValueError, match="n_features"):
        train_text_classifier(df, "label", n_features=0)
    with pytest.raises(ValueError, match="empty"):
        train_text_classifier(df.where("doc_id < 0"), "label", iters=1)
    with pytest.raises(ValueError, match="non-empty"):
        score_documents(df, [])


def test_train_generalizes_to_held_out_split(spark):
    """Held-out AUC check: a silent arithmetic regression that still
    produces plausible row counts (wrong gradient sign, broken sigmoid,
    weight truncation) cannot keep ranking UNSEEN positive docs above
    unseen negative docs. Train on 80% of planted-vocabulary docs, score
    the held-out 20%, require pairwise ranking AUC >= 0.95."""
    pos = ["excellent", "wonderful", "brilliant", "superb", "delightful", "lucid"]
    neg = ["spam", "junk", "garbage", "scam", "clickbait", "sludge"]
    rows = []
    for i in range(60):
        rows.append(
            Row(doc_id=i, text=" ".join(pos[(i + j) % 6] for j in range(8)), label=1)
        )
        rows.append(
            Row(doc_id=1000 + i, text=" ".join(neg[(i + j) % 6] for j in range(8)), label=0)
        )
    df = spark.createDataFrame(rows)
    train = df.where("doc_id % 5 != 0")
    held = df.where("doc_id % 5 = 0")
    w, b = train_text_classifier(train, "label", n_features=128, iters=12, lr=1.0)
    scored = {
        r.doc_id: r.score_micro for r in score_documents(held, w, b).collect()
    }
    labels = {r.doc_id: r.label for r in held.collect()}
    pos_scores = [s for d, s in scored.items() if labels[d] == 1]
    neg_scores = [s for d, s in scored.items() if labels[d] == 0]
    assert pos_scores and neg_scores
    wins = sum(1 for p in pos_scores for n in neg_scores if p > n)
    ties = sum(1 for p in pos_scores for n in neg_scores if p == n)
    auc = (wins + 0.5 * ties) / (len(pos_scores) * len(neg_scores))
    assert auc >= 0.95, f"held-out AUC {auc:.3f}"
