"""Caption quality metrics.

Bit-compatible with the reference scorer (src/utils/metrics.py:25-322) for
gating: identical libraries and parameters (NLTK sentence BLEU with
smoothing method4, NLTK METEOR, rouge_score with stemmer), identical basic
and diversity statistics, and the reference's own *simplified* CIDEr — a
TF-IDF cosine over 1–4 grams with document frequencies counted over
predictions+references jointly (NOT standard CIDEr-D; replicated exactly
because BLEU/CIDEr gating requires matching numbers, metrics.py:186-251).

All of this is host-side Python — scoring never touches the device.
Library availability is guarded like the reference (metrics.py:6-20).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Any, Dict, List

try:
    import contextlib
    import io

    import nltk
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    # METEOR: our offline-capable implementation (utils/meteor.py) —
    # numerically identical to nltk.translate.meteor_score when the wordnet
    # corpus is present, and still reported (exact+stem alignment) when it
    # is not, where the reference's METEOR silently disappears
    # (reference metrics.py:147-162).
    from .meteor import meteor_score

    def _ensure_corpus(corpus: str, path: str) -> None:
        """Download a corpus only if missing AND downloads are enabled.
        The reference calls nltk.download unconditionally at import
        (metrics.py:10-11), which spams stderr forever in offline
        environments; here missing corpora simply leave the dependent
        metric (METEOR) on its graceful-degradation path."""
        try:
            nltk.data.find(path)
            return
        except LookupError:
            pass
        except Exception:
            return
        import os

        if os.environ.get("VCT_NLTK_DOWNLOAD", "0") != "1":
            return
        try:
            with contextlib.redirect_stderr(io.StringIO()), \
                    contextlib.redirect_stdout(io.StringIO()):
                nltk.download(corpus, quiet=True, raise_on_error=True)
        except Exception:
            pass

    _ensure_corpus("wordnet", "corpora/wordnet")
    _ensure_corpus("punkt", "tokenizers/punkt")
    NLTK_AVAILABLE = True
except ImportError:
    NLTK_AVAILABLE = False

try:
    from rouge_score import rouge_scorer

    ROUGE_AVAILABLE = True
except ImportError:
    ROUGE_AVAILABLE = False


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


class CaptionMetrics:
    """Corpus scorer over (prediction, reference) caption pairs."""

    def __init__(self, vocabulary=None):
        self.vocabulary = vocabulary
        if NLTK_AVAILABLE:
            self._smoothing = SmoothingFunction().method4
        if ROUGE_AVAILABLE:
            self._rouge = rouge_scorer.RougeScorer(
                ["rouge1", "rouge2", "rougeL"], use_stemmer=True
            )

    # ------------------------------------------------------------- main

    def compute_metrics(
        self, predictions: List[str], references: List[str]
    ) -> Dict[str, float]:
        out: Dict[str, float] = {}
        out.update(self._basic(predictions, references))
        if NLTK_AVAILABLE:
            out.update(self._bleu(predictions, references))
            try:
                out["meteor"] = self._meteor(predictions, references)
            except Exception:
                pass
        if ROUGE_AVAILABLE:
            out.update(self._rouge_scores(predictions, references))
        out["cider"] = self._cider(predictions, references)
        return out

    # ------------------------------------------------------------ basic

    def _basic(self, predictions: List[str], references: List[str]) -> Dict[str, float]:
        pred_lens = [len(p.split()) for p in predictions]
        ref_lens = [len(r.split()) for r in references]
        pred_vocab = set()
        ref_vocab = set()
        for p in predictions:
            pred_vocab.update(p.lower().split())
        for r in references:
            ref_vocab.update(r.lower().split())
        union = pred_vocab | ref_vocab
        return {
            "avg_pred_length": sum(pred_lens) / len(pred_lens) if pred_lens else 0,
            "avg_ref_length": sum(ref_lens) / len(ref_lens) if ref_lens else 0,
            "vocab_overlap": len(pred_vocab & ref_vocab) / len(union) if union else 0,
        }

    # ------------------------------------------------------------- BLEU

    def _bleu(self, predictions: List[str], references: List[str]) -> Dict[str, float]:
        sums = {f"bleu_{n}": 0.0 for n in range(1, 5)}
        for pred, ref in zip(predictions, references):
            hyp = pred.lower().split()
            refs = [ref.lower().split()]
            for n in range(1, 5):
                weights = tuple([1.0 / n] * n + [0.0] * (4 - n))
                try:
                    sums[f"bleu_{n}"] += sentence_bleu(
                        refs, hyp, weights=weights,
                        smoothing_function=self._smoothing,
                    )
                except Exception:
                    pass
        count = len(predictions)
        return {k: v / count for k, v in sums.items()} if count else sums

    def _meteor(self, predictions: List[str], references: List[str]) -> float:
        total = 0.0
        for pred, ref in zip(predictions, references):
            try:
                total += meteor_score([ref.lower().split()], pred.lower().split())
            except Exception:
                pass
        return total / len(predictions) if predictions else 0.0

    # ------------------------------------------------------------ ROUGE

    def _rouge_scores(
        self, predictions: List[str], references: List[str]
    ) -> Dict[str, float]:
        sums = {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}
        for pred, ref in zip(predictions, references):
            scored = self._rouge.score(ref, pred)
            for k in sums:
                sums[k] += scored[k].fmeasure
        count = len(predictions)
        return {k: v / count for k, v in sums.items()} if count else sums

    # ------------------------------------------------------------ CIDEr

    def _cider(self, predictions: List[str], references: List[str]) -> float:
        """Reference's simplified CIDEr (metrics.py:186-251), replicated."""
        all_texts = predictions + references
        doc_freq: Dict[str, int] = {}
        all_grams = set()
        for text in all_texts:
            toks = text.lower().split()
            for n in range(1, 5):
                for g in _ngrams(toks, n):
                    all_grams.add(g)
                    doc_freq[g] = doc_freq.get(g, 0) + 1

        def tf_idf(grams: Counter) -> Dict[str, float]:
            total = sum(grams.values())
            out = {}
            for g, c in grams.items():
                tf = c / total if total else 0.0
                idf = math.log(len(all_texts) / doc_freq.get(g, 1))
                out[g] = tf * idf
            return out

        score_sum = 0.0
        for pred, ref in zip(predictions, references):
            p_toks = pred.lower().split()
            r_toks = ref.lower().split()
            s = 0.0
            for n in range(1, 5):
                p_vec = tf_idf(_ngrams(p_toks, n))
                r_vec = tf_idf(_ngrams(r_toks, n))
                dot = sum(p_vec.get(g, 0.0) * r_vec.get(g, 0.0) for g in all_grams)
                p_norm = math.sqrt(sum(v * v for v in p_vec.values()))
                r_norm = math.sqrt(sum(v * v for v in r_vec.values()))
                if p_norm > 0 and r_norm > 0:
                    s += dot / (p_norm * r_norm)
            score_sum += s / 4
        return score_sum / len(predictions) if predictions else 0.0

    # -------------------------------------------------------- diversity

    def compute_diversity_metrics(self, predictions: List[str]) -> Dict[str, float]:
        if not predictions:
            return {}
        all_tokens: List[str] = []
        for p in predictions:
            all_tokens.extend(p.lower().split())
        vocab_size = len(set(all_tokens))
        total = len(all_tokens)

        out: Dict[str, float] = {
            "vocab_size": vocab_size,
            "ttr": vocab_size / total if total else 0.0,
        }

        for n in range(1, 4):
            grams: List[str] = []
            for p in predictions:
                toks = p.lower().split()
                grams.extend(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            out[f"distinct_{n}"] = len(set(grams)) / len(grams) if grams else 0.0

        self_bleu = 0.0
        if NLTK_AVAILABLE and len(predictions) > 1:
            for i, pred in enumerate(predictions):
                others = predictions[:i] + predictions[i + 1 :]
                hyp = pred.lower().split()
                scores = []
                for other in others:
                    try:
                        scores.append(
                            sentence_bleu(
                                [other.lower().split()], hyp,
                                smoothing_function=self._smoothing,
                            )
                        )
                    except Exception:
                        pass
                if scores:
                    self_bleu += sum(scores) / len(scores)
            self_bleu /= len(predictions)
        out["self_bleu"] = self_bleu
        return out


def evaluate_model_outputs(
    predictions_file: str, references_file: str, vocabulary=None
) -> Dict[str, Any]:
    """File-based evaluation (parity: reference metrics.py:325-355)."""
    with open(predictions_file, "r") as f:
        predictions = [line.strip() for line in f]
    with open(references_file, "r") as f:
        references = [line.strip() for line in f]

    scorer = CaptionMetrics(vocabulary)
    results = scorer.compute_metrics(predictions, references)
    results.update(scorer.compute_diversity_metrics(predictions))
    return results


def compute_metrics_multi_reference(
    predictions: List[str],
    reference_groups: List[List[str]],
) -> Dict[str, float]:
    """Multi-reference scoring (MSVD has ~40 captions per clip).

    The reference scorer only supports one reference per prediction
    (metrics.py zips pred/ref 1:1); this extension passes ALL of a video's
    references to sentence-BLEU/METEOR (their native multi-reference
    forms) and takes the best ROUGE f-measure across references.
    """
    scorer = CaptionMetrics()
    out: Dict[str, float] = {}
    n = len(predictions)
    if n == 0:
        return out

    if NLTK_AVAILABLE:
        sums = {f"bleu_{k}": 0.0 for k in range(1, 5)}
        meteor_sum, meteor_ok = 0.0, True
        for pred, refs in zip(predictions, reference_groups):
            hyp = pred.lower().split()
            ref_tok = [r.lower().split() for r in refs]
            for k in range(1, 5):
                weights = tuple([1.0 / k] * k + [0.0] * (4 - k))
                try:
                    sums[f"bleu_{k}"] += sentence_bleu(
                        ref_tok, hyp, weights=weights,
                        smoothing_function=scorer._smoothing,
                    )
                except Exception:
                    pass
            try:
                meteor_sum += meteor_score(ref_tok, hyp)
            except Exception:
                meteor_ok = False
        out.update({k: v / n for k, v in sums.items()})
        if meteor_ok:
            out["meteor"] = meteor_sum / n

    if ROUGE_AVAILABLE:
        sums = {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}
        for pred, refs in zip(predictions, reference_groups):
            best = {k: 0.0 for k in sums}
            for ref in refs:
                scored = scorer._rouge.score(ref, pred)
                for k in sums:
                    best[k] = max(best[k], scored[k].fmeasure)
            for k in sums:
                sums[k] += best[k]
        out.update({k: v / n for k, v in sums.items()})

    # CIDEr: the reference's simplified formula with document frequencies
    # over the FULL corpus (all predictions + all references — pairwise
    # df over 2 docs would zero every idf), best cosine across a video's
    # references.
    all_texts = list(predictions) + [r for refs in reference_groups for r in refs]
    doc_freq: Dict[str, int] = {}
    for text in all_texts:
        toks = text.lower().split()
        for k in range(1, 5):
            for g in _ngrams(toks, k):
                doc_freq[g] = doc_freq.get(g, 0) + 1
    n_docs = len(all_texts)

    def tf_idf(tokens, k):
        grams = _ngrams(tokens, k)
        total = sum(grams.values())
        return {
            g: (c / total) * math.log(n_docs / doc_freq.get(g, 1))
            for g, c in grams.items()
        } if total else {}

    def cosine(a, b):
        dot = sum(v * b.get(g, 0.0) for g, v in a.items())
        na = math.sqrt(sum(v * v for v in a.values()))
        nb = math.sqrt(sum(v * v for v in b.values()))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    cider_sum = 0.0
    for pred, refs in zip(predictions, reference_groups):
        p_toks = pred.lower().split()
        best = 0.0
        for ref in refs:
            r_toks = ref.lower().split()
            s = sum(
                cosine(tf_idf(p_toks, k), tf_idf(r_toks, k)) for k in range(1, 5)
            ) / 4
            best = max(best, s)
        cider_sum += best
    out["cider"] = cider_sum / n
    return out
