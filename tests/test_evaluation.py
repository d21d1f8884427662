"""Metric parity vs a pure-Python re-implementation of the reference's
formulas (evaluation_gpt4_vs_gpt5.py:141-225,
whitematter_error_analysis.py:85-112, whitematter_distributions.py:32-69).
"""

import random
from difflib import SequenceMatcher

import pytest
from pyspark.sql import functions as F

from llm_information_extraction_spark.operators.evaluation import (
    apply_semantic_matching,
    binary_metrics,
    category_distribution,
    categorise_cell,
    greedy_error_analysis,
    multilabel_metrics,
)

LABELS = ["a", "b", "c", "d", "e", "f", "g"]


def _random_rows(n, seed):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        gold = sorted(rng.sample(LABELS, rng.randint(0, 4)))
        pred = sorted(rng.sample(LABELS, rng.randint(0, 4)))
        rows.append((gold, pred))
    return rows


def _py_metrics(rows, skip_empty_gold=True):
    """Reference-formula oracle on deduped label sets."""
    if skip_empty_gold:
        rows = [(g, p) for g, p in rows if g]
    per_label = {}
    tp = fp = fn = 0
    sp = sr = sf1 = exact = jac = 0.0
    for g, p in rows:
        gs, ps = set(g), set(p)
        itp, ifp, ifn = len(gs & ps), len(ps - gs), len(gs - ps)
        tp, fp, fn = tp + itp, fp + ifp, fn + ifn
        for lbl in gs | ps:
            t = per_label.setdefault(lbl, [0, 0, 0])
            t[0] += int(lbl in gs and lbl in ps)
            t[1] += int(lbl in ps and lbl not in gs)
            t[2] += int(lbl in gs and lbl not in ps)
        sp += itp / len(ps) if ps else 0.0
        sr += itp / len(gs) if gs else 0.0
        sf1 += 2 * itp / (len(gs) + len(ps)) if gs or ps else 0.0
        exact += float(gs == ps)
        jac += len(gs & ps) / len(gs | ps) if gs | ps else 1.0
    n = len(rows)
    micro_p = tp / (tp + fp) if tp + fp else 0.0
    micro_r = tp / (tp + fn) if tp + fn else 0.0
    micro_f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0
    f1s = [
        2 * t / (2 * t + f_ + n_) if 2 * t + f_ + n_ else 0.0
        for t, f_, n_ in per_label.values()
        if t + f_ + n_ > 0
    ]
    macro_f1 = sum(f1s) / len(f1s) if f1s else 0.0
    return dict(
        micro_p=micro_p, micro_r=micro_r, micro_f1=micro_f1,
        macro_f1=macro_f1, samples_p=sp / n, samples_r=sr / n,
        samples_f1=sf1 / n, subset_accuracy=exact / n,
        jaccard_samples=jac / n, n_rows=n,
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_multilabel_metrics_parity(spark, seed):
    rows = _random_rows(80, seed)
    df = spark.createDataFrame(rows, "gold array<string>, pred array<string>")
    got = multilabel_metrics(df).collect()[0].asDict()
    want = _py_metrics(rows)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, got[k], v)


def test_binary_metrics(spark):
    rows = [("yes", "yes"), ("yes", "no"), ("no", "yes"), ("no", "no"),
            ("yes", "yes"), ("no", "no")]
    df = spark.createDataFrame(rows, "gold string, pred string")
    got = binary_metrics(df).collect()[0].asDict()
    # tp=2 fp=1 fn=1 tn=2
    assert got["accuracy"] == pytest.approx(4 / 6)
    assert got["precision"] == pytest.approx(2 / 3)
    assert got["recall"] == pytest.approx(2 / 3)
    assert got["f1"] == pytest.approx(2 / 3)
    assert got["jaccard"] == pytest.approx(2 / 4)
    assert got["support"] == 3


def test_semantic_matching_rewrites_near_misses(spark):
    df = spark.createDataFrame(
        [
            (["corpus callosum", "fornix"],
             ["corpus calosum", "zzz", "fornix"]),
        ],
        "gold array<string>, pred array<string>",
    )
    out = apply_semantic_matching(df).collect()[0]["pred"]
    assert out == ["corpus callosum", "zzz", "fornix"]
    # sanity: the typo really is >= 0.95 similar
    assert SequenceMatcher(None, "corpus calosum", "corpus callosum").ratio() >= 0.95


def test_greedy_error_analysis_reference_parity(spark):
    def ref_row(gold, pred):
        gold_set, matched = set(gold), set()
        tp = fp = 0
        for p in pred:
            best, bg = 0.0, None
            for g in sorted(gold_set - matched):
                s = SequenceMatcher(None, p, g).ratio()
                if s > best:
                    best, bg = s, g
            if best >= 0.85 and bg is not None:
                tp += 1
                matched.add(bg)
            else:
                fp += 1
        return tp, fp, len(gold_set - matched)

    rows = [
        (["corpus callosum", "fornix"], ["corpus calosum", "fornix", "junk"]),
        (["cingulum"], []),
        ([], ["hallucinated tract"]),
        (["uncinate fasciculus"], ["uncinate fasciculus", "uncinate fasciculus"]),
        ([], []),  # skipped entirely (both empty)
    ]
    want_tp = want_fp = want_fn = 0
    for g, p in rows:
        if not g and not p:
            continue
        t, f_, n_ = ref_row(g, p)
        want_tp, want_fp, want_fn = want_tp + t, want_fp + f_, want_fn + n_
    df = spark.createDataFrame(rows, "gold array<string>, pred array<string>")
    got = greedy_error_analysis(df).collect()[0]
    assert (got["tp"], got["fp"], got["fn"]) == (want_tp, want_fp, want_fn)
    assert got["tp_pct"] == pytest.approx(
        100 * want_tp / (want_tp + want_fp + want_fn)
    )


def test_pivot_f1(spark):
    from llm_information_extraction_spark.operators.evaluation import pivot_f1

    df = spark.createDataFrame(
        [("wmt", "gpt4", 0.49), ("wmt", "gpt5", 0.68),
         ("dti", "gpt4", 0.95), ("dti", "gpt5", 0.99)],
        "field string, model string, f1 double",
    )
    got = {r["field"]: (r["gpt4"], r["gpt5"])
           for r in pivot_f1(df, "field", "model", "f1").collect()}
    assert got == {"dti": (0.95, 0.99), "wmt": (0.49, 0.68)}


@pytest.mark.parametrize("seed", [5, 6])
def test_greedy_matcher_randomized_parity(spark, seed):
    """Randomized corpora incl. near-miss strings: distributed greedy
    TP/FP/FN totals equal the reference formula exactly."""
    rng = random.Random(seed)
    base = ["corpus callosum", "fornix", "cingulum", "uncinate fasciculus",
            "superior longitudinal fasciculus", "arcuate fasciculus"]

    def mutate(s):
        i = rng.randrange(len(s))
        return s[:i] + s[i + 1:] if rng.random() < 0.5 else s[:i] + "x" + s[i:]

    rows = []
    for _ in range(60):
        gold = sorted(rng.sample(base, rng.randint(0, 3)))
        pred = [mutate(g) if rng.random() < 0.4 else g for g in gold]
        pred += [mutate(rng.choice(base)) for _ in range(rng.randint(0, 2))]
        rng.shuffle(pred)
        rows.append((gold, pred))

    def ref_row(gold, pred):
        gold_set, matched = set(gold), set()
        tp = fp = 0
        for p in pred:
            best, bg = 0.0, None
            for g in sorted(gold_set - matched):
                s = SequenceMatcher(None, p, g).ratio()
                if s > best:
                    best, bg = s, g
            if best >= 0.85 and bg is not None:
                tp += 1
                matched.add(bg)
            else:
                fp += 1
        return tp, fp, len(gold_set - matched)

    want = [0, 0, 0]
    for g, p in rows:
        if not g and not p:
            continue
        t = ref_row(g, p)
        want = [a + b for a, b in zip(want, t)]
    df = spark.createDataFrame(rows, "gold array<string>, pred array<string>")
    got = greedy_error_analysis(df).collect()[0]
    assert [got["tp"], got["fp"], got["fn"]] == want


@pytest.mark.parametrize("seed", [7, 8])
def test_semantic_matching_randomized_parity(spark, seed):
    """apply_semantic_matching == the reference's best_semantic_match
    loop on randomized typo'd prediction lists."""
    rng = random.Random(seed)
    base = ["corpus callosum", "fornix", "cingulum", "genu",
            "inferior longitudinal fasciculus", "corticospinal tract"]

    def mutate(s):
        i = rng.randrange(len(s))
        return s[:i] + s[i + 1:]

    rows = []
    for _ in range(60):
        gold = sorted(rng.sample(base, rng.randint(0, 3)))
        pred = [mutate(x) if rng.random() < 0.5 else x
                for x in rng.sample(base, rng.randint(0, 4))]
        rows.append((gold, pred))

    def ref_map(pred_list, gold_list):
        out = []
        for p in pred_list:
            if not gold_list:
                out.append(p)
                continue
            best_ref, best_score, exact = None, 0.0, False
            for g in gold_list:
                if p == g:
                    out.append(g)
                    exact = True
                    break
                s = SequenceMatcher(None, p, g).ratio()
                if s > best_score:
                    best_score, best_ref = s, g
            if not exact:
                out.append(best_ref if best_score >= 0.95 else p)
        return out

    df = spark.createDataFrame(rows, "gold array<string>, pred array<string>")
    got = [
        (r["gold"], r["pred"])
        for r in apply_semantic_matching(df).orderBy("gold", "pred").collect()
    ]
    want = sorted(
        [(g, ref_map(p, g)) for g, p in rows], key=lambda x: (x[0], x[1])
    )
    assert got == want


def test_categorise_decision_table(spark):
    cases = {
        None: "NA",
        "": "NA",
        "na": "NA",
        "Not Reported": "NA",
        "global": "Global",
        "Global white matter": "Global",
        "wm": "Global",
        "globally reduced": "Global",   # startswith('global')
        "corpus callosum": "Specific",
        "global, corpus callosum": "Specific",  # specific beats global
        "na; global": "Global",
        "na, none": "NA",
        "white matter; all tracts": "Global",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [r[0] for r in df.select(categorise_cell("v")).collect()]
    assert got == list(cases.values())


def test_category_distribution_percentages(spark):
    df = spark.createDataFrame(
        [("corpus callosum",), ("global",), ("na",), ("fornix",)], "v string"
    )
    got = {r["category"]: r["pct"] for r in category_distribution(df, "v").collect()}
    assert got == {"Specific": 50.0, "Global": 25.0, "NA": 25.0}
