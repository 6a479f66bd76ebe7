"""Config-zoo coverage: every YAML in configs/ (and every reference YAML)
loads, passes sanity_check, and builds a model + optimizer param groups."""
import glob
import os

import pytest

from devis_tpu.config import get_cfg_defaults, sanity_check

REPO = os.path.join(os.path.dirname(__file__), "..")
ZOO = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                       recursive=True))
REFERENCE_ZOO = sorted(glob.glob("/root/reference/configs/**/*.yaml",
                                 recursive=True))


def _load(path):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(path)
    cfg.freeze()
    sanity_check(cfg)
    return cfg


@pytest.mark.parametrize("path", ZOO, ids=[os.path.basename(p) for p in ZOO])
def test_zoo_config_builds_model_and_param_groups(path):
    from devis_tpu.engine import PARAM_GROUPS, _param_group
    from devis_tpu.models import build_model

    cfg = _load(path)
    model = build_model(num_classes=41, cfg=cfg)
    assert model is not None
    # param-group assignment must resolve for representative key paths
    for key in ("backbone.conv1.kernel",
                "transformer.encoder.layers_0.self_attn.sampling_offsets.kernel",
                "class_embed.kernel"):
        assert _param_group(key, cfg) in PARAM_GROUPS


def test_zoo_mirrors_reference():
    """Every reference recipe has a same-named counterpart in our zoo
    (18/18 parity; reference configs/)."""
    ref_names = {os.path.basename(p) for p in REFERENCE_ZOO}
    our_names = {os.path.basename(p) for p in ZOO}
    missing = sorted(ref_names - our_names)
    assert not missing, missing


@pytest.mark.parametrize(
    "ref_path", REFERENCE_ZOO,
    ids=[os.path.basename(p) for p in REFERENCE_ZOO])
def test_zoo_value_parity_with_reference(ref_path):
    """Same-named zoo configs resolve to the SAME cfg values as the reference
    YAMLs (parity modulo comments/whitespace) — guards hyperparameter drift."""
    rel = os.path.relpath(ref_path, "/root/reference")
    ours = os.path.join(REPO, rel)
    assert os.path.exists(ours), f"missing zoo mirror for {rel}"
    assert _load(ours).dump() == _load(ref_path).dump()


@pytest.mark.parametrize("path", REFERENCE_ZOO,
                         ids=[os.path.basename(p) for p in REFERENCE_ZOO])
def test_reference_config_loads_verbatim(path):
    cfg = _load(path)
    assert cfg.MODEL.NUM_QUERIES > 0
