from speech_recognition_tpu.decode.isolated import score_models, classify_batch
from speech_recognition_tpu.decode.connected import (
    decode_connected,
    connected_graph_arrays,
)
from speech_recognition_tpu.decode.dtw import dtw_classify_batch, fit_template, stack_templates
from speech_recognition_tpu.decode.streaming import StreamingDecoder
from speech_recognition_tpu.decode.lextree import beam_decode_lextree, decode_lextree
from speech_recognition_tpu.decode.confidence import path_posteriors, word_confidence
