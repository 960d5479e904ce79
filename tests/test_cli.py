"""CLI end-to-end: prepare-data -> train -> evaluate -> attack -> dolphin,
all on a tiny synthetic corpus, exercising the real console entrypoints."""

import json
import os

import numpy as np
import pytest

from asr_using_robust_nn_tpu.cli.main import main
from asr_using_robust_nn_tpu.utils import audio_io


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    sr = 16000
    for wi, w in enumerate(["zero", "one", "two"]):
        d = root / "data" / w
        d.mkdir(parents=True)
        for i in range(10):
            t = np.arange(sr) / sr
            y = 0.4 * np.sin(2 * np.pi * (250 + 200 * wi) * t)
            y += 0.03 * rng.standard_normal(sr)
            audio_io.write_wav(d / f"{i}.wav", y.astype(np.float32), sr)
    return root


@pytest.fixture(scope="module")
def artifacts(corpus):
    out = corpus / "processed"
    rc = main([
        "prepare-data", "--task", "digit", "--data-dir", str(corpus / "data"),
        "--out-dir", str(out), "--seed", "0", "--backend", "xla",
    ])
    assert rc == 0
    return out


@pytest.fixture(scope="module")
def trained_pair(corpus, artifacts):
    """Train tiny unconstrained + constrained digit models via the CLI."""
    cu = corpus / "ck_u"
    cc = corpus / "ck_c"
    for variant, ck in [("unconstrained", cu), ("constrained", cc)]:
        rc = main([
            "train", "--task", "digit", "--variant", variant,
            "--data", str(artifacts), "--ckpt", str(ck),
            "--epochs", "4", "--patience", "10", "--batch-size", "8",
            "--log-every", "0",
        ])
        assert rc == 0
    return cu, cc


class TestCLI:
    def test_prepare_artifacts_exist(self, artifacts):
        names = set(os.listdir(artifacts))
        assert {"train_data.npy", "dev_data.npy", "test_data.npy"} <= names
        assert (artifacts / "test_dataset_to_add_noise" / "test_filenames.npy").exists()
        d = np.load(artifacts / "train_data.npy")
        assert d.shape[1] == 880

    def test_evaluate(self, artifacts, trained_pair, capsys):
        cu, _ = trained_pair
        rc = main([
            "evaluate", "--task", "digit", "--data", str(artifacts),
            "--ckpt", str(cu), "--variant", "unconstrained",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Test accuracy" in out or "test_accuracy" in out

    def test_attack_white_mfcc(self, artifacts, trained_pair, corpus, capsys):
        cu, cc = trained_pair
        out_json = corpus / "curve.json"
        rc = main([
            "attack", "--type", "white_mfcc", "--task", "digit",
            "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--strengths", "0.0,5.0", "--out", str(out_json),
        ])
        assert rc == 0
        curve = json.loads(out_json.read_text())
        assert len(curve["accuracy_constrained"]) == 2

    def test_attack_fgsm(self, artifacts, trained_pair, capsys):
        cu, cc = trained_pair
        rc = main([
            "attack", "--type", "fgsm", "--task", "digit",
            "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--strengths", "0.5", "--max-samples", "3",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "strength=0.5" in out

    def test_certify(self, artifacts, trained_pair, corpus, capsys):
        cu, cc = trained_pair
        out_json = corpus / "cert.json"
        rc = main([
            "certify", "--task", "digit", "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--out", str(out_json),
        ])
        assert rc == 0
        cert = json.loads(out_json.read_text())
        assert cert["norm"] == "l2"
        assert len(cert["certified_constrained"]) == 10
        assert cert["strengths"][0] == 0.0
        assert cert["lipschitz_sound_constrained"] > 0
        # eps=0 certified accuracy == the clean accuracy `evaluate` reports
        assert cert["certified_constrained"][0] <= 1.0
        # monotone nonincreasing lower bound
        cc_curve = cert["certified_constrained"]
        assert all(a >= b for a, b in zip(cc_curve, cc_curve[1:]))

    def test_certify_linf_explicit_grid(self, artifacts, trained_pair,
                                        capsys):
        cu, cc = trained_pair
        rc = main([
            "certify", "--task", "digit", "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--norm", "linf", "--strengths", "0.0,0.01",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "eps=0" in out
        res = json.loads(out.strip().splitlines()[-1])
        assert res["norm"] == "linf"
        assert len(res["certified_unconstrained"]) == 2

    def test_attack_audio_domain(self, artifacts, trained_pair, capsys):
        cu, cc = trained_pair
        rc = main([
            "attack", "--type", "white_audio", "--task", "digit",
            "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--strengths", "0.01",
        ])
        assert rc == 0

    def test_dolphin(self, corpus, tmp_path):
        voice = corpus / "data" / "zero" / "0.wav"
        out = tmp_path / "attack.wav"
        rc = main(["dolphin", "--voice", str(voice), "--out", str(out)])
        assert rc == 0
        _, rate = audio_io.read_wav(out)
        assert rate == 192_000

    def test_train_with_h5_export_and_attack_from_h5(
        self, artifacts, corpus, capsys
    ):
        h5 = corpus / "model.h5"
        rc = main([
            "train", "--task", "digit", "--variant", "constrained",
            "--data", str(artifacts), "--ckpt", str(corpus / "ck_h5"),
            "--epochs", "2", "--patience", "10", "--batch-size", "8",
            "--log-every", "0", "--export-h5", str(h5),
        ])
        assert rc == 0
        assert h5.exists()
        rc = main([
            "attack", "--type", "white_mfcc", "--task", "digit",
            "--data", str(artifacts),
            "--constrained", str(h5), "--unconstrained", str(h5),
            "--strengths", "0.0",
        ])
        assert rc == 0

    def test_train_resume_keeps_best_and_optimizer(self, artifacts, corpus,
                                                   capsys):
        """--resume must seed best-val from the checkpoint meta (a worse
        first resumed epoch may NOT overwrite the better saved best) and
        restore the Adam trajectory without structure errors."""
        import json

        ck = corpus / "ck_resume"
        rc = main([
            "train", "--task", "digit", "--variant", "unconstrained",
            "--data", str(artifacts), "--ckpt", str(ck),
            "--epochs", "4", "--patience", "10", "--batch-size", "8",
        ])
        assert rc == 0
        meta0 = json.loads((ck / "meta.json").read_text())
        rc = main([
            "train", "--task", "digit", "--variant", "unconstrained",
            "--data", str(artifacts), "--ckpt", str(ck), "--resume",
            "--epochs", "1", "--patience", "10", "--batch-size", "8",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "resumed from" in out
        meta1 = json.loads((ck / "meta.json").read_text())
        assert meta1["val_loss"] <= meta0["val_loss"] + 1e-9

    def test_resume_without_checkpoint_errors(self, artifacts, corpus):
        """--resume at a ckpt dir with no 'best' must return 2, not
        silently train from scratch (round-3 review)."""
        rc = main([
            "train", "--task", "digit", "--variant", "unconstrained",
            "--data", str(artifacts), "--ckpt", str(corpus / "no_such_ck"),
            "--resume", "--epochs", "1",
        ])
        assert rc == 2

    def test_prepare_empty_corpus_leaves_no_artifacts(self, tmp_path):
        """A wrong-layout corpus dir must fail BEFORE writing zero-row
        artifacts that would pass cmd_train's exists-check."""
        bad = tmp_path / "bad"
        (bad / "not_a_class").mkdir(parents=True)
        out = tmp_path / "out"
        rc = main(["prepare-data", "--task", "digit",
                   "--data-dir", str(bad), "--out-dir", str(out)])
        assert rc == 2
        assert not (out / "train_data.npy").exists()

    def test_fgsm_raw_grid_when_standardize_after(self, artifacts,
                                                  trained_pair, capsys,
                                                  tmp_path):
        """--standardize after must select the raw-dB eps grid 1-30 (50
        points), not the standardized 0.01-0.3 grid (reference
        attacks.py:497-499; round-3 name-swap fix)."""
        import json as _json

        cu, cc = trained_pair
        out = tmp_path / "fgsm_raw.json"
        rc = main([
            "attack", "--type", "fgsm", "--task", "digit",
            "--data", str(artifacts),
            "--constrained", str(cc), "--unconstrained", str(cu),
            "--standardize", "after", "--out", str(out),
        ])
        assert rc == 0
        curve = _json.loads(out.read_text())
        strengths = curve["strengths"]
        assert len(strengths) == 50
        assert abs(strengths[0] - 1.0) < 1e-9
        assert abs(strengths[-1] - 30.0) < 1e-9

    def test_missing_subcommand_errors(self):
        with pytest.raises(SystemExit):
            main([])

    def test_train_with_config_file(self, artifacts, corpus):
        import json as _json

        conf = corpus / "conf.json"
        conf.write_text(_json.dumps({
            "task": "digit", "variant": "constrained", "constraint": "simple",
            "rho": 0.1, "batch_size": 8, "patience": 5, "epochs": 2,
        }))
        rc = main([
            "train", "--config", str(conf), "--data", str(artifacts),
            "--ckpt", str(corpus / "ck_conf"), "--log-every", "0",
        ])
        assert rc == 0

    def test_friendly_errors(self, tmp_path, capsys):
        rc = main(["prepare-data", "--task", "digit",
                   "--data-dir", str(tmp_path / "nope"),
                   "--out-dir", str(tmp_path / "o")])
        assert rc == 2
        assert "does not exist" in capsys.readouterr().err
        rc = main(["train", "--task", "digit", "--data", str(tmp_path),
                   "--ckpt", str(tmp_path / "ck")])
        assert rc == 2
        assert "prepare-data" in capsys.readouterr().err
        rc = main(["evaluate", "--task", "digit",
                   "--data", str(tmp_path), "--ckpt", str(tmp_path / "missing")])
        assert rc == 2  # artifacts missing caught before checkpoint

    def test_config_variant_actually_applies(self, artifacts, corpus, capsys):
        """Regression: a truthy argparse default must not mask config keys —
        the shipped constrained recipe must actually train constrained."""
        import json as _json

        conf = corpus / "conf2.json"
        conf.write_text(_json.dumps({
            "task": "digit", "variant": "constrained", "constraint": "simple",
            "rho": 0.5, "batch_size": 8, "patience": 5, "epochs": 2,
        }))
        rc = main([
            "train", "--config", str(conf), "--data", str(artifacts),
            "--ckpt", str(corpus / "ck_conf2"), "--log-every", "0",
        ])
        assert rc == 0
        # the constrained variant clamps kernels NonNeg: verify on the ckpt
        from asr_using_robust_nn_tpu.cli.main import load_model, model_cfg_for
        from asr_using_robust_nn_tpu.models.mlp import dense_kernels

        p, s = load_model(corpus / "ck_conf2", model_cfg_for("digit", "constrained"))
        assert all(float(np.min(np.asarray(w))) >= 0.0 for w in dense_kernels(p))

    def test_config_rejects_unknown_and_invalid(self, artifacts, corpus, capsys):
        import json as _json

        bad1 = corpus / "bad1.json"
        bad1.write_text(_json.dumps({"task": "digit", "batchsize": 8}))
        assert main(["train", "--config", str(bad1), "--data", str(artifacts),
                     "--ckpt", str(corpus / "x")]) == 2
        assert "unknown config keys" in capsys.readouterr().err
        bad2 = corpus / "bad2.json"
        bad2.write_text(_json.dumps({"task": "Digit"}))
        assert main(["train", "--config", str(bad2), "--data", str(artifacts),
                     "--ckpt", str(corpus / "x")]) == 2

    def test_profile_writes_trace(self, tmp_path, capsys):
        rc = main(["profile", "--task", "digit", "--variant", "unconstrained",
                   "--out", str(tmp_path / "trace"), "--steps", "2",
                   "--batch-size", "16"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "trace_dir" in out
        # jax profiler writes a plugins/profile tree
        found = list((tmp_path / "trace").rglob("*"))
        assert found, "no trace artifacts written"


class TestTrainMulti:
    def test_subcommand_table_names_agree(self):
        """Every _SUBCOMMANDS key must be exactly the name its add-fn
        registers (regression: train-multi was parsed but undispatched —
        KeyError only at runtime, caught by a live drive in round 3)."""
        import argparse

        from asr_using_robust_nn_tpu.cli import main as cli

        ap = argparse.ArgumentParser()
        sub = ap.add_subparsers(dest="cmd")
        for key, (add_fn, _) in cli._SUBCOMMANDS.items():
            before = set(sub.choices)
            add_fn(sub)
            assert set(sub.choices) - before == {key}

    def test_train_multi_grid(self, artifacts, corpus, capsys):
        """2 seeds x 2 rhos fused grid via the CLI: per-run checkpoints
        restorable, JSON summary with 4 runs, stronger rho -> smaller
        Lipschitz product."""
        import json as _json

        ck = corpus / "ck_multi"
        rc = main([
            "train-multi", "--task", "digit", "--variant", "constrained",
            "--constraint", "simple", "--seeds", "0,1",
            "--rhos", "0.1,5.0", "--data", str(artifacts),
            "--ckpt", str(ck), "--epochs", "2", "--epochs-per-dispatch", "2",
            "--batch-size", "8", "--patience", "4",
        ])
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_runs"] == 4
        assert [r["seed"] for r in out["runs"]] == [0, 0, 1, 1]
        assert [r["rho"] for r in out["runs"]] == [0.1, 5.0, 0.1, 5.0]
        from asr_using_robust_nn_tpu.cli.main import load_model, model_cfg_for
        from asr_using_robust_nn_tpu.constraints.lipschitz import (
            get_norms,
            get_upper_lipschitz,
        )

        cfg = model_cfg_for("digit", "constrained")
        lips = []
        for r in out["runs"]:
            p, _ = load_model(r["ckpt"], cfg)
            lips.append(float(get_upper_lipschitz(get_norms(p))))
        assert lips[0] < lips[1] and lips[2] < lips[3], lips

    def test_train_multi_arg_errors(self, artifacts, capsys):
        assert main(["train-multi", "--task", "digit", "--seeds", "a,b",
                     "--data", str(artifacts), "--ckpt", "/tmp/x"]) == 2
        assert "comma-separated ints" in capsys.readouterr().err
        assert main(["train-multi", "--task", "digit", "--seeds", "0",
                     "--rhos", "0.1", "--data", str(artifacts),
                     "--ckpt", "/tmp/x"]) == 2
        assert "constrained" in capsys.readouterr().err


class TestInfer:
    def test_infer_digit_dir(self, artifacts, trained_pair, corpus, capsys):
        """Serving CLI end-to-end: WAV dir -> per-file labels + latency
        stats, one compiled program per padding bucket (serve/engine.py)."""
        cu, _ = trained_pair
        rc = main([
            "infer", "--task", "digit", "--variant", "unconstrained",
            "--ckpt", str(cu), "--data", str(artifacts),
            "--audio", str(corpus / "data" / "zero"),
            "--buckets", "16", "--warmup",
        ])
        assert rc == 0
        summ = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summ["n_files"] == 10
        assert all(0 <= r["label"] < 10 for r in summ["results"])
        assert summ["latency"]["n"] >= 1 and summ["latency"]["p50_ms"] > 0
        assert summ["frontend_backend"] == "xla"  # CPU auto resolution

    def test_infer_matches_engine(self, artifacts, trained_pair, corpus,
                                  capsys):
        """The CLI's labels equal the library engine's on the same files."""
        from asr_using_robust_nn_tpu.serve import InferenceEngine

        cu, _ = trained_pair
        wavs = str(corpus / "data" / "one")
        rc = main(["infer", "--task", "digit", "--ckpt", str(cu),
                   "--data", str(artifacts), "--audio", wavs,
                   "--buckets", "16"])
        assert rc == 0
        summ = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        eng = InferenceEngine.from_checkpoint(
            "digit", "unconstrained", str(cu), artifacts_dir=str(artifacts),
            buckets=(16,))
        res = eng.classify_files([r["path"] for r in summ["results"]])
        assert [r["label"] for r in summ["results"]] == \
            [r["label"] for r in res]

    def test_infer_arg_errors(self, artifacts, trained_pair, tmp_path,
                              capsys):
        cu, _ = trained_pair
        assert main(["infer", "--task", "digit", "--ckpt", str(cu),
                     "--audio", "/tmp/definitely-missing.wav"]) == 2
        assert "--data" in capsys.readouterr().err
        assert main(["infer", "--task", "digit", "--ckpt", str(cu),
                     "--data", str(artifacts),
                     "--audio", str(tmp_path / "missing.wav")]) == 2
        assert "neither" in capsys.readouterr().err
        empty = tmp_path / "emptydir"
        empty.mkdir()
        assert main(["infer", "--task", "digit", "--ckpt", str(cu),
                     "--data", str(artifacts), "--audio", str(empty)]) == 2
        assert "no .wav" in capsys.readouterr().err
        assert main(["infer", "--task", "digit", "--ckpt", str(cu),
                     "--data", str(artifacts), "--audio", str(empty),
                     "--buckets", "4,x"]) == 2
        assert "comma-separated" in capsys.readouterr().err
