"""tools/train.py end-to-end CLI smoke (verdict item 10): multi-epoch
training on the synthetic dataset + --eval_after_train, driven exactly the
way a user runs it. Asserts every configured epoch actually runs (the
round-1 smoke stopped after 1 of 4 — this gate would have caught it),
checkpoints rotate in, and eval products appear."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _tiny_cfg(tmp_path):
    sys.path.insert(0, str(REPO))
    from __graft_entry__ import _model_cfg
    from test_pipeline import synthetic_cfg

    model = json.loads(json.dumps(_model_cfg()))  # plain dicts
    # 2-block variant keeps the CPU compile tolerable
    model["BACKBONE_3D"]["PARAMS"] = model["BACKBONE_3D"]["PARAMS"][:2]
    model["MAP_TO_BEV"]["NUM_BEV_FEATURES"] = 64 * 2
    cfg = {
        "CLASS_NAMES": ["Vehicle", "Pedestrian", "Cyclist"],
        "DATA_CONFIG": json.loads(json.dumps(synthetic_cfg())),
        "MODEL": model,
        "OPTIMIZATION": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 2,
            "OPTIMIZER": "adam_onecycle", "LR": 0.003,
            "WEIGHT_DECAY": 0.01, "MOMENTUM": 0.9, "MOMS": [0.95, 0.85],
            "PCT_START": 0.4, "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10,
        },
    }
    p = tmp_path / "cfgs" / "synthetic_models" / "tiny_mssvt.yaml"
    p.parent.mkdir(parents=True)
    p.write_text(yaml.safe_dump(cfg))
    return p


@pytest.mark.slow
def test_train_cli_two_epochs_and_eval(tmp_path):
    cfg_path = _tiny_cfg(tmp_path)
    out_root = tmp_path / "output"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MSSVT_OUTPUT_ROOT"] = str(out_root)
    # hermetic subprocess: drop conftest's virtual-8-device XLA_FLAGS (the
    # CLI would otherwise shard batch 2 over 8 devices and fail the
    # divisibility assert) and the axon TPU plugin's site dir (its eager
    # init can hang the subprocess when the TPU tunnel is unreachable,
    # even under JAX_PLATFORMS=cpu)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"),
         "--cfg_file", str(cfg_path), "--epochs", "2", "--batch_size", "2",
         "--workers", "0", "--extra_tag", "ci", "--eval_after_train",
         "--num_devices", "1"],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    run_dirs = list(out_root.rglob("ckpt"))
    assert run_dirs, list(out_root.rglob("*"))
    ckpt_dir = run_dirs[0]
    from mssvt_tpu.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(ckpt_dir))
    steps = sorted(mgr.all_steps())
    assert steps == [1, 2], steps  # one checkpoint per epoch, BOTH epochs ran

    # eval-after-train produced its artifacts
    evals = list(out_root.rglob("result.pkl"))
    assert evals, "eval_after_train produced no result.pkl"
    logs = list(out_root.rglob("log_train_*.txt"))
    assert logs
    text = logs[0].read_text()
    assert "epoch" in text.lower()
