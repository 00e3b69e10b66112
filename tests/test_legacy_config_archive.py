"""config_prev archive loader: every retired reference yaml must parse
into the typed record and map onto our legacy training surfaces
(reference: HaplotypeModel/config_prev/*.yaml, 17 files)."""
import glob
import os

import pytest

from nanosnp_tpu.legacy.config_archive import (load_archive_config,
                                               parse_archive_config)

ARCHIVE_DIR = "/root/reference/HaplotypeModel/config_prev"
pytestmark = pytest.mark.skipif(not os.path.isdir(ARCHIVE_DIR),
                                reason="reference checkout not present")


def _paths():
    return sorted(glob.glob(os.path.join(ARCHIVE_DIR, "*.yaml")))


def test_all_archives_parse():
    paths = _paths()
    assert len(paths) == 17
    fams = {"edge": 0, "cat": 0}
    for p in paths:
        cfg = load_archive_config(p)
        fams[cfg.family] += 1
        assert cfg.configname
        assert cfg.data, p
        # archive 'Ranger' must come out as ranger21 (never the
        # PileupModel-era 'ranger' flavor)
        assert cfg.train.optim.type in ("lookahead_adam", "ranger21",
                                        "adam", "sgd", "adadelta")
    # the archive holds both dead generations
    assert fams["cat"] >= 6 and fams["edge"] >= 5


def test_cat_family_mapping_builds_model_and_optimizer():
    import jax

    from nanosnp_tpu.legacy.catmodel import init_catmodel_params
    from nanosnp_tpu.train.optim import build_optimizer

    cfg = load_archive_config(os.path.join(ARCHIVE_DIR, "cat45.yaml"))
    assert cfg.family == "cat"
    assert cfg.use_g == {"use_g0": False, "use_g1": True,
                         "use_g2": False, "use_g3": False}
    assert cfg.pileup_length == 11 and cfg.gt_classes == 10
    # archive 'Ranger' means HaplotypeModel/optim.py:104's Ranger21 class
    assert cfg.train.optim.type == "ranger21"
    assert cfg.train.optim.lr == pytest.approx(1e-5)
    assert cfg.train.optim.max_grad_norm == 2.0   # lives under training:
    assert cfg.train.first_stage is None          # -1 -> disabled
    params = init_catmodel_params(jax.random.PRNGKey(0),
                                  **cfg.catmodel_init_kwargs())
    assert params["out"]["w"].shape[-1] == cfg.gt_classes
    from nanosnp_tpu.train.optim import (is_lookahead_type,
                                         wrap_params_for_lookahead)
    tx = build_optimizer(cfg.train.optim, steps_per_epoch=10)
    wrapped = wrap_params_for_lookahead(
        params, is_lookahead_type(cfg.train.optim.type))
    state = tx.init(wrapped)
    assert state is not None
    assert "optim.momentum" in cfg.ignored


def test_edge_family_geometry_and_gt15_variant():
    cfg = load_archive_config(os.path.join(ARCHIVE_DIR, "edges.yaml"))
    assert cfg.family == "edge"
    assert (cfg.enc_hidden, cfg.enc_output, cfg.enc_layers) == (64, 128, 2)
    assert cfg.joint_inner == 256 and cfg.feature_dim == 25
    assert cfg.zy_classes == 2
    assert cfg.train.optim.type == "lookahead_adam"
    # edge-family configs must refuse CatModel init
    with pytest.raises(ValueError):
        cfg.catmodel_init_kwargs()


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="unknown optimizer"):
        parse_archive_config({"model": {}, "optim": {"type": "LAMB"}})
    with pytest.raises(ValueError, match="config_prev"):
        parse_archive_config({"optim": {}})
