from speech_recognition_tpu.train.em import em_fit
from speech_recognition_tpu.train.kmeans import kmeans
from speech_recognition_tpu.train.skmeans import skmeans, calc_transition_costs
from speech_recognition_tpu.train.isolated import fit_hmm, fit_gmm_state
