"""End-to-end CLI tests on CPU: train -> artifacts -> inference -> resume.

Uses a tiny model (init_ch=8, 32x32 crop) so CPU compiles stay cheap; the
full-size path is exercised on the real TPU by bench.py and smoke runs.
"""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, timeout=900):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""     # skip axon registration
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable] + argv, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_root = str(root / "data")
    out_root = str(root / "outputs" / "chaos")
    r = _run([
        "train_chaos.py", "--tag", "e2e", "--session", "Experiment",
        "--do_loss_ent", "--do_decoder_consistency", "--do_aux_path",
        "--do_memory", "--synthetic_data", "20", "--epoch", "2",
        "--batch_size", "4", "--fold", "0", "--init_ch", "8",
        "--input_size", "32", "32", "--compute_dtype", "float32",
        "--steps_per_dispatch", "2", "--ckp_interval", "1",
        "--data_root", data_root, "--root", out_root,
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    run_dirs = glob.glob(out_root + "/t1/Experiment/Experiment-*")
    assert len(run_dirs) == 1
    return {"root": str(root), "data_root": data_root,
            "out_root": out_root, "run_dir": run_dirs[0]}


def test_train_artifacts(trained):
    rd = trained["run_dir"]
    assert os.path.isfile(os.path.join(rd, "log.txt"))
    assert os.path.isfile(os.path.join(rd, "valdice.npz"))
    assert os.path.isdir(os.path.join(rd, "best_ckp"))
    assert os.path.isdir(os.path.join(rd, "ckps", "ckp_0"))
    assert os.path.isdir(os.path.join(rd, "ckps", "ckp_1"))
    cfg = json.load(open(os.path.join(rd, "config.json")))
    assert cfg["session"] == "Experiment" and cfg["do_memory"] is True
    vd = np.load(os.path.join(rd, "valdice.npz"))["valdice"]
    assert vd.shape == (2,)
    log = open(os.path.join(rd, "log.txt")).read()
    assert "loss_pce" in log and "val: 001" in log


def test_inference_cli(trained):
    rd = trained["run_dir"]
    out_root = os.path.join(trained["root"], "outputs")
    r = _run([
        "inference.py", "--dataset", "chaost1", "--fold", "0",
        "--checkpoint_file", rd, "--best_ckp", "--init_ch", "8",
        "--compute_dtype", "float32", "--batch_size", "4",
        "--data_root", trained["data_root"], "--root", out_root,
        "--save_pred",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    eval_npz = glob.glob(out_root + "/Inference/chaost1/*/eval_data.npz")
    assert len(eval_npz) == 1
    data = np.load(eval_npz[0])
    assert data["dicearr"].shape[1] == 5
    assert data["hd95arr"].shape == data["dicearr"].shape
    # --save_pred streams one npz per slice, keyed by uid, cropped uint8
    preds = sorted(glob.glob(out_root + "/Inference/chaost1/*/preds/*.npz"))
    assert len(preds) == data["dicearr"].shape[0]
    p0 = np.load(preds[0])
    assert p0["pred"].dtype == np.uint8 and p0["pred"].max() < 5
    assert str(p0["uid"]) + ".npz" == os.path.basename(preds[0])


def test_inference_cli_spatial_matches(trained):
    """--spatial_shards 4 on the 8-device CPU mesh reproduces the plain
    inference metrics (the constraint only reshards activations;
    parallel/spatial.py)."""
    rd = trained["run_dir"]
    out_plain = os.path.join(trained["root"], "outputs_sp1")
    out_sp = os.path.join(trained["root"], "outputs_sp4")
    args = [
        "inference.py", "--dataset", "chaost1", "--fold", "0",
        "--checkpoint_file", rd, "--best_ckp", "--init_ch", "8",
        "--compute_dtype", "float32", "--batch_size", "4",
        "--data_root", trained["data_root"],
    ]
    r1 = _run(args + ["--root", out_plain])
    assert r1.returncode == 0, r1.stderr[-3000:]
    r2 = _run(args + ["--root", out_sp, "--spatial_shards", "4"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    d1 = np.load(glob.glob(out_plain + "/Inference/chaost1/*/eval_data.npz")[0])
    d2 = np.load(glob.glob(out_sp + "/Inference/chaost1/*/eval_data.npz")[0])
    # GSPMD reduction-order differences can exceed 1e-6 on some backends;
    # 1e-5 on float dice still pins layout-independent predictions
    assert np.allclose(d1["dicearr"], d2["dicearr"], equal_nan=True, atol=1e-5)


def test_resume(trained):
    """--resume restores from the latest checkpoint and continues."""
    rd = trained["run_dir"]
    from pacingpseudo_tpu.train.checkpoint import latest_checkpoint
    assert latest_checkpoint(rd).endswith("ckp_1")


def test_upper_bound_cli(tmp_path):
    data_root = str(tmp_path / "data")
    out_root = str(tmp_path / "outputs" / "chaos")
    r = _run([
        "upper_bound_chaos.py", "--tag", "ub", "--fold", "0",
        "--synthetic_data", "12", "--epoch", "1", "--batch_size", "4",
        "--init_ch", "8", "--input_size", "32", "32",
        "--compute_dtype", "float32", "--data_root", data_root,
        "--root", out_root,
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    log = glob.glob(out_root + "/t1/Upperbound/*/log.txt")
    assert len(log) == 1
    content = open(log[0]).read()
    assert "loss_ce" in content and "loss_dice" in content


def test_scribble_tools_cli(tmp_path):
    from pacingpseudo_tpu.data.synthetic import write_synthetic_dataset
    root = str(tmp_path)
    write_synthetic_dataset(root, "lvsc", 3, (32, 32), 2, 2, seed=1)
    in_dir = os.path.join(root, "lvsc", "slices")
    out_dir = os.path.join(root, "short")
    r = _run(["-m", "pacingpseudo_tpu.cli.scribble_tools", "shorten",
              "--in_dir", in_dir, "--out_dir", out_dir,
              "--num_classes", "2", "--ignored_index", "2", "--ratio", "0.5"])
    assert r.returncode == 0, r.stderr[-2000:]
    outs = sorted(glob.glob(out_dir + "/*.npz"))
    assert len(outs) == 3
    for a, b in zip(sorted(glob.glob(in_dir + "/*.npz")), outs):
        sa = np.load(a)["scb"]
        sb = np.load(b)["scb"]
        for cls in range(2):
            la, lb = (sa == cls).sum(), (sb == cls).sum()
            if la > 0:
                assert lb <= max(np.ceil(la * 0.5), 1) + 8  # shortened

    r2 = _run(["-m", "pacingpseudo_tpu.cli.scribble_tools", "generate",
               "--in_dir", in_dir, "--out_dir", os.path.join(root, "gen"),
               "--num_classes", "2", "--ignored_index", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    gen = np.load(sorted(glob.glob(root + "/gen/*.npz"))[0])["scb"]
    assert set(np.unique(gen)) <= {0, 1, 2}


def test_sweep_cli(tmp_path):
    """One-fold sweep: train + per-fold inference + aggregated table."""
    data_root = str(tmp_path / "data")
    out_root = str(tmp_path / "outputs" / "chaos")
    r = _run([
        "-m", "pacingpseudo_tpu.cli.sweep", "--tag", "sw", "--session",
        "Control", "--folds", "0", "--synthetic_data", "15", "--epoch", "1",
        "--batch_size", "4", "--init_ch", "8", "--input_size", "32", "32",
        "--compute_dtype", "float32", "--data_root", data_root,
        "--root", out_root,
    ], timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = glob.glob(out_root + "/sweep-sw/sweep_summary.json")
    assert len(summary) == 1
    data = json.load(open(summary[0]))
    assert "0" in data["folds"] and 0.0 <= data["overall_dice"] <= 1.0
    table = open(out_root + "/sweep-sw/sweep_table.md").read()
    assert "DSC" in table and "HD95" in table
    # Per-fold resumability: re-invocation consumes the fold0.json cache
    # instead of retraining (seconds, not minutes).
    assert glob.glob(out_root + "/sweep-sw/fold0.json")
    r2 = _run([
        "-m", "pacingpseudo_tpu.cli.sweep", "--tag", "sw", "--session",
        "Control", "--folds", "0", "--synthetic_data", "15", "--epoch", "1",
        "--batch_size", "4", "--init_ch", "8", "--input_size", "32", "32",
        "--compute_dtype", "float32", "--data_root", data_root,
        "--root", out_root,
    ], timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "cached" in r2.stdout
    data2 = json.load(open(summary[0]))
    assert data2["overall_dice"] == data["overall_dice"]


def test_acdc_train_and_eval(tmp_path):
    """The non-chaos dataset axis (4 classes, no modality dir) end-to-end."""
    data_root = str(tmp_path / "data")
    out_root = str(tmp_path / "outputs" / "acdc")
    r = _run([
        "train_chaos.py", "--dataset", "acdc", "--tag", "ac", "--session",
        "Experiment", "--do_loss_ent", "--do_decoder_consistency",
        "--synthetic_data", "12", "--epoch", "1", "--batch_size", "4",
        "--fold", "0", "--init_ch", "8", "--input_size", "32", "32",
        "--compute_dtype", "float32", "--data_root", data_root,
        "--root", out_root,
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    run_dirs = glob.glob(out_root + "/Experiment/Experiment-*")
    assert len(run_dirs) == 1  # no modality level for acdc
    r2 = _run([
        "inference.py", "--dataset", "acdc", "--fold", "0",
        "--checkpoint_file", run_dirs[0], "--best_ckp", "--init_ch", "8",
        "--compute_dtype", "float32", "--data_root", data_root,
        "--root", str(tmp_path / "outputs"),
    ])
    assert r2.returncode == 0, r2.stderr[-3000:]
    npz = glob.glob(str(tmp_path / "outputs") + "/Inference/acdc/*/eval_data.npz")
    assert len(npz) == 1
    assert np.load(npz[0])["dicearr"].shape[1] == 4


def test_resume_continues_training(trained):
    """--resume --run_dir restores the latest checkpoint and finishes the
    remaining epochs in the same directory."""
    rd = trained["run_dir"]
    r = _run([
        "train_chaos.py", "--tag", "e2e", "--session", "Experiment",
        "--do_loss_ent", "--do_decoder_consistency", "--do_aux_path",
        "--do_memory", "--epoch", "3", "--batch_size", "4", "--fold", "0",
        "--init_ch", "8", "--input_size", "32", "32",
        "--compute_dtype", "float32", "--steps_per_dispatch", "2",
        "--ckp_interval", "1", "--resume", "--run_dir", rd,
        "--data_root", trained["data_root"], "--root", trained["out_root"],
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(rd, "log.txt")).read()
    assert "resumed from" in log
    assert os.path.isdir(os.path.join(rd, "ckps", "ckp_2"))
    vd = np.load(os.path.join(rd, "valdice.npz"))["valdice"]
    assert vd.shape == (3,)
