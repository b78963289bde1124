"""Reference mapper config translation + EQ exclusion semantics.

The reference's mapper entrypoint reads a `mapper_settings` block (ref:
Entrypoints/mapper.py:28-55) with CLI > mapper_settings > defaults
precedence (:352), sharing the step1..4_settings AutoTS base config.
"""

import numpy as np
import pytest

from multioptpy_tpu.workflows.mapper import (
    MapperConfig, mapper_config_from_v1)

V1 = {
    "mapper_settings": {
        "temperature_K": 450.0,
        "rmsd_threshold": 0.25,
        "max_iterations": 7,
        "afir_gamma_kJmol": 80.0,
        "max_pairs": 3,
        "dist_lower_ang": 1.2,
        "dist_upper_ang": 4.5,
        "output_dir": "netmap",
        "rng_seed": 11,
        "active_atoms": [1, 2, 5],
        "include_negative_gamma": True,
        "excluded_node_ids": [2, 4],
        "exclude_bond_rearrangement": True,
        "use_rcmc": True,
        "rcmc_temperature_K": 500.0,
        "rcmc_reaction_time_s": 2.5,
        "rcmc_start_node_id": 1,
    },
    "step2_settings": {"NSTEP": 25},
    "step3_settings": {"opt_method": ["rsirfo_block_bofill"],
                       "calc_exact_hess": 4},
}


def test_mapper_settings_translate():
    cfg = mapper_config_from_v1(V1)
    assert cfg.rmsd_threshold_ang == pytest.approx(0.25)
    assert cfg.max_explorations == 7
    assert cfg.afir_gamma == pytest.approx(80.0)
    assert cfg.max_pairs_per_node == 3
    assert cfg.dist_lower_ang == pytest.approx(1.2)
    assert cfg.dist_upper_ang == pytest.approx(4.5)
    assert cfg.work_dir == "netmap"
    assert cfg.seed == 11
    assert cfg.active_atoms == (1, 2, 5)
    assert cfg.include_negative_gamma is True
    assert cfg.excluded_node_ids == (2, 4)
    assert cfg.exclude_bond_rearrangement is True
    # RCMC: queue switched on, kinetics temperature wins
    assert cfg.queue == "rcmc"
    assert cfg.temperature_k == pytest.approx(500.0)
    assert cfg.rcmc_reaction_time_s == pytest.approx(2.5)
    assert cfg.rcmc_start_node == 1
    # shared stepN_settings feed the per-task AutoTS base config
    assert cfg.autots.neb.n_steps == 25
    assert cfg.autots.saddle.method == "rsirfo_block_bofill"
    assert cfg.autots.saddle.fc_count == 4


def test_cli_overrides_beat_mapper_settings():
    cfg = mapper_config_from_v1(V1, temperature_k=600.0, seed=99,
                                max_nodes=3)
    assert cfg.temperature_k == pytest.approx(600.0)
    assert cfg.seed == 99
    assert cfg.max_nodes == 3
    # untouched keys still come from mapper_settings
    assert cfg.max_explorations == 7


def test_excluded_seed_node_blocks_exploration(tmp_path):
    """excluded_node_ids containing the seed (EQ0) means no tasks are ever
    generated: the network stays a single node with no edges (ref:
    Wrapper/mapper.py:1295 'will not be explored further')."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.workflows.mapper import map_network

    r = 7.1
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [r, 0.0, 0.0], [r / 2, r * 0.9, 0.0]]))
    z = jnp.array([18, 18, 18])
    cfg = MapperConfig(
        max_nodes=4, max_explorations=2, afir_gamma=30.0,
        dist_lower_ang=0.5, dist_upper_ang=9.0,
        excluded_node_ids=(0,), work_dir=str(tmp_path),
        opt=OptimizeConfig(method="rfo_fsb", nsteps=40))
    net = map_network(LennardJones(), coords, z, cfg)
    assert len(net.nodes) == 1
    assert len(net.edges) == 0


def test_reference_mapper_fixture_translates():
    """The reference's shipped mapper config (test/config_mapper_test.json)
    translates end to end, including the fischerd3old model-Hessian kind."""
    import json

    import jax.numpy as jnp

    from multioptpy_tpu.hessian.model import model_hessian

    with open("/root/reference/test/config_mapper_test.json") as f:
        cfg = json.load(f)
    mc = mapper_config_from_v1(cfg)
    assert mc.temperature_k == pytest.approx(500.0)
    assert mc.rmsd_threshold_ang == pytest.approx(0.50)
    assert mc.max_explorations == 150
    assert mc.afir_gamma == pytest.approx(300.0)
    assert mc.dist_lower_ang == pytest.approx(2.0)
    assert mc.seed == 30
    assert mc.work_dir == "mapper_output"
    # nested AutoTS: step3 tight + min/max trust radii, fischerd3old kind
    assert mc.autots.saddle.trust_radius_ang == pytest.approx(0.2)
    assert mc.autots.saddle.trust_radius_min_ang == pytest.approx(0.1)
    assert mc.autots.afir_opt.init_hessian == "model:fischerd3old"
    assert mc.autots.node_distance_ang == pytest.approx(0.50)
    assert mc.autots.irc.step_size == pytest.approx(0.4)
    # the kind is actually buildable (folds to the static-D3 correction,
    # ref: ModelHessian/fischerd3old.py)
    c = jnp.asarray(np.random.default_rng(0).standard_normal((3, 3)) * 2)
    h = model_hessian(c, jnp.array([8, 1, 1]), kind="fischerd3old")
    assert h.shape == (9, 9)
