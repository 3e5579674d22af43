"""Vocabulary parity tests (reference contract: src/data/vocabulary.py)."""

import json

from video_captioning_tpu.config import Config
from video_captioning_tpu.data.vocabulary import Vocabulary, tokenize


def make_config(threshold=1, max_size=50):
    cfg = Config()
    cfg.data.vocab_threshold = threshold
    cfg.data.max_vocab_size = max_size
    return cfg


def test_special_token_indices():
    vocab = Vocabulary(make_config())
    assert vocab.pad_idx == 0
    assert vocab.start_idx == 1
    assert vocab.end_idx == 2
    assert vocab.unk_idx == 3
    assert vocab.word2idx["<PAD>"] == 0
    assert vocab.idx2word[3] == "<UNK>"
    assert len(vocab) == 4


def test_tokenize_matches_reference_regex():
    assert tokenize("A man, is RUNNING!") == ["a", "man", "is", "running"]
    assert tokenize("  hello   world  ") == ["hello", "world"]
    assert tokenize("it's a dog's day") == ["its", "a", "dogs", "day"]
    assert tokenize("...") == []
    assert tokenize("under_score stays") == ["under_score", "stays"]


def test_build_frequency_order_and_threshold():
    vocab = Vocabulary(make_config(threshold=2))
    captions = [
        "dog runs fast",
        "dog jumps",
        "dog sits",
        "cat jumps",
        "cat sleeps",
        "bird flies",  # bird/flies appear once -> filtered
    ]
    vocab.build_vocabulary(captions)
    # dog x3 most frequent; cat/jumps x2 in first-seen order
    assert vocab.word2idx["dog"] == 4
    assert vocab.word2idx["jumps"] == 5  # seen before cat's 2nd occurrence
    assert vocab.word2idx["cat"] == 6
    assert "bird" not in vocab
    assert "flies" not in vocab


def test_max_vocab_cap_reserves_special_slots():
    cfg = make_config(threshold=1, max_size=6)
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(["a b c d e f g h"])
    assert len(vocab) == 6  # 4 specials + 2 words


def test_encode_decode_roundtrip():
    vocab = Vocabulary(make_config())
    vocab.build_vocabulary(["a man is running", "a dog is barking"])
    ids = vocab.encode_caption("a man is running")
    assert ids[0] == vocab.start_idx
    assert ids[-1] == vocab.end_idx
    assert vocab.decode_caption(ids) == "a man is running"


def test_encode_unk_fallback():
    vocab = Vocabulary(make_config())
    vocab.build_vocabulary(["a man"])
    ids = vocab.encode_caption("a zebra")
    assert ids == [1, vocab.word2idx["a"], 3, 2]


def test_decode_keeps_post_end_tokens_like_reference():
    # Reference quirk (vocabulary.py:182-192): with remove_special_tokens,
    # the END break is unreachable and post-END words are kept.
    vocab = Vocabulary(make_config())
    vocab.build_vocabulary(["a man is running"])
    a = vocab.word2idx["a"]
    man = vocab.word2idx["man"]
    assert vocab.decode_caption([1, a, 2, man, 0]) == "a man"
    # Without removal, decode stops AT the end token.
    assert vocab.decode_caption([1, a, 2, man], remove_special_tokens=False) == (
        "<START> a"
    )


def test_save_load_roundtrip(tmp_path):
    cfg = make_config()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(["a man is running fast today"])
    path = tmp_path / "vocab.json"
    vocab.save(path)

    payload = json.loads(path.read_text())
    assert set(payload) == {"word2idx", "idx2word", "config"}
    assert payload["config"]["pad_token"] == "<PAD>"

    loaded = Vocabulary.load(path, cfg)
    assert loaded.word2idx == vocab.word2idx
    assert loaded.idx2word == vocab.idx2word
    assert loaded.encode_caption("a man") == vocab.encode_caption("a man")


def test_coverage():
    vocab = Vocabulary(make_config())
    vocab.build_vocabulary(["a man"])
    assert vocab.coverage(["a man"]) == 1.0
    assert vocab.coverage(["a zebra"]) == 0.5


def test_rare_words_and_frequencies():
    vocab = Vocabulary(make_config())
    caps = ["dog dog cat", "dog bird"]
    freqs = vocab.get_word_frequencies(caps)
    assert freqs == {"dog": 3, "cat": 1, "bird": 1}
    assert vocab.get_rare_words(caps, threshold=2) == {"cat", "bird"}
