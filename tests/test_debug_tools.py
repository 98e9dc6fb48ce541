"""Debug-harness utilities: loss-curve plotting from metrics.jsonl and
checkpoint tree inspection (reference: osu_diffusion/testing/plot_loss.py,
osu_diffusion/testing/print_ckpt.py)."""

import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]


def _write_metrics(path: Path, n: int = 30, offset: int = 0) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            step = (i + 1) * 10 + offset
            f.write(json.dumps({
                "step": step,
                "train/loss": 3.0 / (i + 1),
                "train/mfu": 0.25,
                "test/loss": 3.5 / (i + 1),
            }) + "\n")


def test_plot_loss_end_to_end(tmp_path):
    sys.path.insert(0, str(REPO_ROOT / "utils"))
    try:
        import plot_loss
    finally:
        sys.path.pop(0)

    m1 = tmp_path / "metrics.jsonl"
    m2 = tmp_path / "resumed.jsonl"
    _write_metrics(m1)
    _write_metrics(m2, n=10)
    out = tmp_path / "loss.png"

    # default key selection: only *loss series, not mfu
    series = plot_loss.read_series(m1)
    assert set(series) == {"train/loss", "test/loss"}
    steps, values = series["train/loss"]
    assert steps[0] == 10 and len(values) == 30

    # explicit keys + offset
    series = plot_loss.read_series(m2, keys=["train/mfu"], offset=300)
    assert set(series) == {"train/mfu"}
    assert series["train/mfu"][0][0] == 310

    # smoothing preserves length and the running mean
    sm = plot_loss.smooth([1.0, 3.0, 5.0, 7.0], 2)
    assert sm == [1.0, 2.0, 4.0, 6.0]

    rc = plot_loss.main([str(m1), str(m2), "--offsets", "0", "300",
                         "--smooth", "5", "--out", str(out)])
    assert rc == 0
    assert out.stat().st_size > 0


def test_print_ckpt_native_and_msgpack(tmp_path, capsys):
    sys.path.insert(0, str(REPO_ROOT / "utils"))
    try:
        import print_ckpt
    finally:
        sys.path.pop(0)

    from flax import serialization

    tree = {
        "params": {
            "encoder": {"kernel": np.zeros((4, 8), np.float32),
                        "bias": np.zeros((8,), np.float32)},
            "decoder": {"embedding": np.zeros((16, 4), np.float32)},
        }
    }
    # bare msgpack file
    blob = tmp_path / "params.msgpack"
    blob.write_bytes(serialization.msgpack_serialize(tree))
    loaded, fmt = print_ckpt.load_tree(blob)
    assert fmt == "flax msgpack"
    assert loaded["params"]["encoder"]["kernel"].shape == (4, 8)

    # native checkpoint dir layout
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    (ckpt_dir / "params.msgpack").write_bytes(serialization.msgpack_serialize(tree))
    (ckpt_dir / "model_config.json").write_text("{}")
    _, fmt = print_ckpt.load_tree(ckpt_dir)
    assert fmt == "native"

    rc = print_ckpt.main([str(ckpt_dir), "--filter", "encoder"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "params.encoder.kernel  (4, 8)  float32" in out
    assert "decoder" not in out.split("[native]")[0].replace(
        "params.encoder", "")  # filtered out
    assert "40 parameters" in out  # totals cover the filtered view: 4*8 + 8


def test_print_ckpt_orbax_manager_root(tmp_path, capsys):
    sys.path.insert(0, str(REPO_ROOT / "utils"))
    try:
        import print_ckpt
    finally:
        sys.path.pop(0)

    import orbax.checkpoint as ocp

    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    mgr = ocp.CheckpointManager(
        tmp_path / "run", options=ocp.CheckpointManagerOptions(create=True)
    )
    mgr.save(5, args=ocp.args.Composite(state=ocp.args.StandardSave(tree)))
    mgr.wait_until_finished()
    mgr.close()

    # pointing at the manager root resolves the newest step's state dir
    loaded, fmt = print_ckpt.load_tree(tmp_path / "run")
    assert fmt == "orbax"
    flat = dict(print_ckpt._flatten(loaded))
    [(path, leaf)] = [(k, v) for k, v in flat.items() if getattr(v, "shape", None)]
    assert leaf.shape == (2, 3)

    rc = print_ckpt.main([str(tmp_path / "run")])
    assert rc == 0
    assert "(2, 3)" in capsys.readouterr().out
