"""Smoke tests for the experiment CLIs (tiny configs, CPU)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml


def test_run_and_eval_sarl(tmp_path, monkeypatch):
    cfg = {
        "rl_n_steps": 2,
        "rl_n_envs": 2,
        "rl_batch_size": 2,
        "rl_n_epochs": 1,
        "rl_nr_iterations": 2,
        "rbc_heater_duration": 0.125,
        "rbc_rayleigh_number": 2500,
        "rbc_episode_length": 1,
        "rbc_state_shape": [16, 32, 32],
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "run"

    monkeypatch.setattr(
        sys, "argv",
        ["run_sarl.py", "--config", str(cfg_path), "--output_dir", str(out)],
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
    import run_sarl

    run_sarl.main()

    assert (out / "config.yaml").exists()
    assert (out / "metrics.jsonl").exists()
    assert (out / "models" / "final_model.msgpack").exists()
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["rollout/nusselt_mean"])
    # Regression: EvaluationCallback runs BEFORE MetricsLogger so eval/*
    # lands in metrics.jsonl (eval freq=10 fires at iteration 0).
    rec0 = json.loads(lines[0])
    assert np.isfinite(rec0["eval/nusselt"])
    assert np.isfinite(rec0["eval/reward"])

    # eval against the final model
    monkeypatch.setattr(
        sys, "argv",
        ["eval_sarl.py", str(out), "--model", "models/final_model.msgpack"],
    )
    import eval_sarl

    eval_sarl.main()

    # trained-vs-zero-vs-random comparison on the held-out test bank
    monkeypatch.setattr(
        sys, "argv",
        ["eval_baselines.py", str(out), "--episodes", "2",
         "--model", "models/final_model.msgpack"],
    )
    import eval_baselines

    eval_baselines.main()
    summary = json.loads((out / "baseline_eval.json").read_text())
    for pol in ("trained", "zero", "random"):
        assert np.isfinite(summary[pol]["nusselt_mean"])

    # learning-curve figure straight from metrics.jsonl + baseline_eval.json
    monkeypatch.setattr(sys, "argv", ["plot_training.py", str(out)])
    import plot_training

    plot_training.main()
    assert (out / "curves.png").stat().st_size > 0


def test_sbatch_args_roundtrip_cli(monkeypatch):
    """Regression (round-1 verdict): every flag scripts/train_sa.sbatch
    passes must be accepted by run_sarl.py's argparse."""
    import re

    sbatch = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "train_sa.sbatch"
    )
    text = open(sbatch).read()
    # Only flags actually passed to run_sarl.py: the ARGS=( ... ) block plus
    # the conditional ARGS+=( ... ) appends.
    blocks = re.findall(r"ARGS\+?=\((.*?)\)", text, flags=re.S)
    flags = set(re.findall(r"(--[a-z_]+)", "\n".join(blocks)))
    argv = ["run_sarl.py"]
    value_flags = {
        "--output_dir": "/tmp/x",
        "--num_envs": "64",
        "--iterations": "200",
        "--n_steps": "96",
        "--ra": "2500",
        "--checkpoint": "/tmp/bank.h5",
        "--config": "/tmp/cfg.yaml",
    }
    for f in sorted(flags):
        if f in value_flags:
            argv += [f, value_flags[f]]
        else:
            argv.append(f)  # boolean flags: --wandb, --resume_training
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "experiments")
    )
    import run_sarl

    args = run_sarl.parse_args()  # argparse would SystemExit on unknown flags
    assert args.num_envs == 64 and args.iterations == 200
    assert args.n_steps == 96 and args.ra == 2500
    assert args.checkpoint == "/tmp/bank.h5"


def test_flowstats_tiny(tmp_path, monkeypatch):
    out = tmp_path / "flowstats.pkl"
    monkeypatch.setattr(
        sys, "argv",
        [
            "flowstats_ra.py",
            "--ra", "500",
            "--steps", "5",
            "--state_shape", "8", "16", "16",
            "--dt_solver", "0.01",
            "--heater_duration", "0.125",
            "--out", str(out),
        ],
    )
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "experiments", "flowstats"),
    )
    import flowstats_ra

    flowstats_ra.main()
    with open(out, "rb") as f:
        records = pickle.load(f)
    assert len(records) == 1
    assert len(records[0]["nusselt"]) == 5
    assert np.isfinite(records[0]["nusselt"]).all()
    assert os.path.exists(str(out).replace(".pkl", ".json"))


def test_burnin_bank_roundtrip(tmp_path):
    """On-device burn-in produces a loadable, turbulent bank."""
    import jax.numpy as jnp
    from rbc_gym_tpu.sim import burnin
    from rbc_gym_tpu.sim.grid import Grid2D
    from rbc_gym_tpu.utils import checkpoints as ck
    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
    import jax

    grid = Grid2D(nx=32, nz=16, lx=2 * np.pi, lz=2.0)
    bank = burnin.generate_bank_2d(
        ra=10_000, n_episodes=3, seed=42, grid=grid, duration=30.0,
    )
    assert bank.b.shape == (3, 32, 16)
    assert bank.w.shape == (3, 32, 17)
    # episodes are distinct
    assert not np.allclose(bank.b[0], bank.b[1])

    for ext in ("h5", "npz"):
        path = str(tmp_path / f"bank.{ext}")
        ck.save_bank_2d(path, bank)
        loaded = ck.load_bank_2d(path)
        np.testing.assert_allclose(loaded.b, bank.b, rtol=1e-7)
        np.testing.assert_allclose(loaded.w, bank.w, rtol=1e-7)
        assert loaded.start_seed == 42

    # the bank feeds the vector env
    env = RBC2DVectorEnv(
        num_envs=2,
        state_shape=(16, 32),
        observation_shape=(8, 16),
        heater_duration=0.3,
        episode_length=3.0,
        checkpoint=str(tmp_path / "bank.h5"),
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.zeros((2, 12)))
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_run_sarl_2d(tmp_path, monkeypatch):
    """2D PPO CLI end-to-end at tiny shapes (no reference counterpart —
    the reference trains 3D only; experiments/run_sarl_2d.py)."""
    cfg = {
        "rl_n_steps": 2,
        "rl_n_envs": 2,
        "rl_batch_size": 2,
        "rl_n_epochs": 1,
        "rl_nr_iterations": 2,
        "rbc_heater_duration": 0.3,
        "rbc_rayleigh_number": 10_000,
        "rbc_episode_length": 0.9,
        "rbc_observation_shape": [8, 16],
        "rbc_state_shape": [16, 32],
        "rbc_checkpoint": None,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "run2d"
    monkeypatch.setattr(
        sys, "argv",
        ["run_sarl_2d.py", "--config", str(cfg_path), "--output_dir", str(out)],
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
    import run_sarl_2d

    run_sarl_2d.main()
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["rollout/nusselt_mean"])
    assert np.isfinite(json.loads(lines[0])["eval/nusselt"])
    assert (out / "models" / "final_model.msgpack").exists()


def test_run_sarl_2d_generalist(tmp_path, monkeypatch):
    """Multi-Ra generalist trainer end-to-end at tiny shapes: round-robin
    rollouts over per-Ra envs, one shared TrainState, per-rung eval dirs
    (experiments/run_sarl_2d_generalist.py; beyond reference scope — the
    reference trains one Ra per run)."""
    out = tmp_path / "gen"
    monkeypatch.setattr(
        sys, "argv",
        ["run_sarl_2d_generalist.py", "--ras", "10000", "30000",
         "--iterations", "4", "--num_envs", "2", "--n_steps", "4",
         "--batch_size", "8", "--output_dir", str(out)],
    )
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "experiments")
    )
    import run_sarl_2d_generalist

    run_sarl_2d_generalist.main()
    recs = [json.loads(l)
            for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert [r["ra"] for r in recs] == [10000, 30000, 10000, 30000]
    assert all(np.isfinite(r["rollout/nusselt_mean"]) for r in recs)
    # per-rung eval dirs consumable by eval_baselines.py
    for ra in (10000, 30000):
        d = out / f"ra{ra}"
        assert (d / "models" / "best_model.msgpack").exists()
        rung = yaml.safe_load((d / "config.yaml").read_text())
        assert rung["rbc_rayleigh_number"] == ra
