from speech_recognition_tpu.langmodel.bigram import BigramLM, fit_bigram, scale, uniform_bigram
from speech_recognition_tpu.langmodel.lextree import LexTree, lextree_from_words
from speech_recognition_tpu.langmodel.spellcheck import text_viterbi, SpellChecker
