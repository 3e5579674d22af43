from .vocabulary import Vocabulary, build_vocabulary_from_csv, tokenize  # noqa: F401
