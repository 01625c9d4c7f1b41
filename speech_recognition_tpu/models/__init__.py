from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
from speech_recognition_tpu.models.graph import WordGraph, build_word_graph, pad_graphs
