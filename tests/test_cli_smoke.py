"""CLI end-to-end smoke test: the full user journey in one pass
(synth -> isolated train/test -> continuous train -> connected test)."""

import glob
import os

import numpy as np
import pytest

from speech_recognition_tpu.cli import main


def test_cli_pipeline(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main(["synth", "-o", "data", "--n-train", "4", "--n-test", "2",
          "--n-continuous", "24"])
    main(["isolated_train", "-i", "data/train", "-o", "models/bank.npz",
          "--n-gaussians", "2"])
    main(["isolated_test", "-i", "models/bank.npz", "-d", "data/test"])
    out = capsys.readouterr().out
    acc = float(out.strip().splitlines()[-1])
    assert acc >= 0.8, f"CLI isolated accuracy {acc}"

    main(["continuous_train", "-i", "models/bank.npz", "-o", "models-cont",
          "-d", "data/train", "--iterations", "2"])
    cks = sorted(glob.glob("models-cont/*.npz"))
    assert len(cks) == 2

    # resume: one more iteration picks up from the latest checkpoint
    main(["continuous_train", "-i", "models/bank.npz", "-o", "models-cont",
          "-d", "data/train", "--iterations", "1"])
    out = capsys.readouterr().out
    assert "resuming from" in out
    assert len(glob.glob("models-cont/*.npz")) == 3

    main(["connected_test", "-i", sorted(glob.glob("models-cont/*.npz"))[-1],
          "-d", "data/test", "--graph", "loop", "--lm", "bigram"])
    out = capsys.readouterr().out
    wer = float([l for l in out.splitlines() if l.startswith("WER:")][0].split()[1])
    assert wer <= 0.25, f"CLI connected WER {wer}"

    # the lextree decoder on the flat digit vocabulary is provably the
    # loop graph: identical WER line for line
    main(["connected_test", "-i", sorted(glob.glob("models-cont/*.npz"))[-1],
          "-d", "data/test", "--graph", "lextree", "--lm", "bigram"])
    out = capsys.readouterr().out
    wer_lex = float(
        [l for l in out.splitlines() if l.startswith("WER:")][0].split()[1])
    assert wer_lex == wer, (wer_lex, wer)


def test_cli_pipeline_cmvn_silence(tmp_path, capsys, monkeypatch):
    """CMVN + silence-model flags end to end."""
    monkeypatch.chdir(tmp_path)
    main(["synth", "-o", "data", "--n-train", "4", "--n-test", "2",
          "--n-continuous", "16"])
    main(["isolated_train", "-i", "data/train", "-o", "models/bank.npz",
          "--n-gaussians", "2", "--norm", "cmvn", "--silence"])
    out = capsys.readouterr().out
    assert "trained silence model" in out
    main(["isolated_test", "-i", "models/bank.npz", "-d", "data/test"])
    acc = float(capsys.readouterr().out.strip().splitlines()[-1])
    assert acc >= 0.8, acc
    main(["continuous_train", "-i", "models/bank.npz", "-o", "models-cont",
          "-d", "data/train", "--iterations", "1"])
    import glob as g

    ck = sorted(g.glob("models-cont/*.npz"))[-1]
    main(["connected_test", "-i", ck, "-d", "data/test", "--graph", "loop"])
    out = capsys.readouterr().out
    wer = float([l for l in out.splitlines() if l.startswith("WER:")][0].split()[1])
    assert wer <= 0.3, wer
    # reference-parity sausage mode: one batched decode per distinct
    # transcript length (round-1 decoded one utterance at a time)
    main(["connected_test", "-i", ck, "-d", "data/test", "--graph", "sausage"])
    out = capsys.readouterr().out
    wer_s = float([l for l in out.splitlines()
                   if l.startswith("WER:")][0].split()[1])
    assert wer_s <= 0.35, wer_s


def test_cli_align(tmp_path, capsys, monkeypatch):
    """Forced-alignment command produces sane word segments."""
    import json

    monkeypatch.chdir(tmp_path)
    main(["synth", "-o", "data", "--n-train", "3", "--n-test", "1",
          "--n-continuous", "6"])
    main(["isolated_train", "-i", "data/train", "-o", "models/bank.npz",
          "--n-gaussians", "2"])
    main(["align", "-i", "models/bank.npz", "-d", "data/train",
          "-o", "align.jsonl"])
    rows = [json.loads(l) for l in open("align.jsonl")]
    assert len(rows) > 10
    for r in rows:
        assert r["segments"], r
        # segments tile the utterance without gaps
        assert r["segments"][0]["start_s"] == 0.0
        for a, b in zip(r["segments"], r["segments"][1:]):
            assert a["end_s"] == b["start_s"]
        # words (ignoring silence) spell the filename transcript
        from speech_recognition_tpu.data.aurora import transcript_from_filename

        words = [s["word"] for s in r["segments"] if s["word"] != "sil"]
        # consecutive duplicates can appear only for repeated digits;
        # compare against the transcript directly
        assert "".join(words) == transcript_from_filename(r["file"])
