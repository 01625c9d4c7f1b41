from speech_recognition_tpu.data.wav import read_wav, write_wav
from speech_recognition_tpu.data.aurora import (
    transcript_from_filename,
    labels_from_transcript,
    isolated_file_pattern,
)
from speech_recognition_tpu.data.synthetic import SyntheticDigits
from speech_recognition_tpu.data.endpoint import endpoint_signal
