"""Task-level invariance of the emission GEMM precision: decode the
same corpus with MATMUL_PRECISION = highest vs high (via
SRT_MATMUL_PRECISION in two subprocesses so no jit cache crosses) and
compare the decoded word sequences.  Run from /root/repo on TPU."""
import json
import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
sys.path.insert(0, "/root/repo")
from speech_recognition_tpu.data.synthetic import SyntheticDigits
from speech_recognition_tpu.decode.connected import decode_connected
from speech_recognition_tpu.models.graph import build_loop_graph
from speech_recognition_tpu.models.hmm import HMMBank
from speech_recognition_tpu.train.isolated import fit_hmm
from speech_recognition_tpu.ops.frontend import mfcc39_batch, padded_length
from speech_recognition_tpu.config import FrontendConfig

gen = SyntheticDigits(seed=29)
train = gen.isolated_corpus(5)
test = gen.continuous_corpus(48)
cfg = FrontendConfig()

def featurize(utts):
    cap = max(len(u.samples) for u in utts)
    L = padded_length(cfg, cap)
    buf = np.zeros((len(utts), L), np.float32)
    lens = np.zeros((len(utts),), np.int32)
    for i, u in enumerate(utts):
        buf[i, : len(u.samples)] = u.samples
        lens[i] = len(u.samples)
    fb, nfb = mfcc39_batch(jnp.asarray(buf), jnp.asarray(lens), cfg)
    return np.asarray(fb), np.asarray(nfb)

ftr, ntr = featurize(train)
by_digit = {}
for u, f, n in zip(train, ftr, ntr):
    by_digit.setdefault(u.labels[0], []).append(f[:n])
key = jax.random.PRNGKey(0)
models = [fit_hmm(key, by_digit[d]) for d in sorted(by_digit)]
bank = HMMBank.stack(models)
graph = build_loop_graph([np.asarray(m.trans_cost) for m in models])
fte, nte = featurize(test)
seqs, costs = decode_connected(bank, graph, jnp.asarray(fte), jnp.asarray(nte))
print("RESULT " + json.dumps({"seqs": seqs,
                              "refs": [list(u.labels) for u in test]}))
"""


def run(prec):
    env = dict(os.environ, SRT_MATMUL_PRECISION=prec, PYTHONUNBUFFERED="1")
    out = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=HERE,
                         capture_output=True, text=True, timeout=800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"child failed for {prec}")


def main():
    sys.path.insert(0, str(HERE))
    from speech_recognition_tpu.utils.metrics import wer

    a = run("highest")
    b = run("high")
    wa = wer(a["seqs"], a["refs"])
    wb = wer(b["seqs"], b["refs"])
    same = sum(x == y for x, y in zip(a["seqs"], b["seqs"]))
    print(f"emission highest: WER {wa:.4f}; high: WER {wb:.4f}; "
          f"identical decodes {same}/{len(a['seqs'])}", file=sys.stderr)


if __name__ == "__main__":
    main()
