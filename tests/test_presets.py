"""Named BASELINE.json benchmark presets: load, map, and train one tiny iter.

Each preset corresponds to one entry of BASELINE.json `configs`
(see dcc_tpu/configs/env_config/*.yaml).
"""

import jax
import pytest

from dcc_tpu.algos import MAPPO
from dcc_tpu.configs import PRESETS, load, load_preset, to_maddpg_config


def test_all_presets_load():
    assert set(PRESETS) == {
        "default",
        "3uav_small",
        "5uav_dense_conn",
        "10uav_moving_collision",
        "throughput_4096",
        "20uav_16k_dist",
    }
    for name in PRESETS:
        cfg, env_cfg, algo_cfg = load_preset(name)
        assert env_cfg.n_agents >= 3 and env_cfg.n_pois >= 10
        assert algo_cfg.episode_length == env_cfg.max_ep_len


def test_preset_shapes():
    _, env3, _ = load_preset("3uav_small")
    assert (env3.n_agents, env3.n_pois) == (3, 10)
    assert env3.effective_contact_force == 0.0

    _, env5, _ = load_preset("5uav_dense_conn")
    assert (env5.n_agents, env5.n_pois) == (5, 36)
    assert env5.effective_contact_force > 0.0  # connectivity force ON

    _, env10, _ = load_preset("10uav_moving_collision")
    assert env10.n_agents == 10
    assert env10.poi_speed > 0 and env10.collision_penalty > 0
    assert env10.randomize_pois

    _, envt, algot = load_preset("throughput_4096")
    assert algot.n_rollout_threads == 4096

    _, env20, algo20 = load_preset("20uav_16k_dist")
    assert env20.n_agents == 20 and algo20.n_rollout_threads == 16384
    # production scale config: mixed precision + chunked accumulation.
    # use_remat stays on: a no-op cost when the fused trunk is active
    # (single-chip bf16) but load-bearing under a multi-chip mesh where
    # fused_trunk=auto resolves off (the preset's named use-case).
    assert algo20.compute_dtype == "bfloat16"
    assert algo20.use_remat and algo20.update_chunks == 4


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        load_preset("nope")


@pytest.mark.parametrize("name", ["3uav_small", "5uav_dense_conn", "10uav_moving_collision"])
def test_preset_trains_one_tiny_iter(name):
    # shrink run shape so this is a smoke test, keep the env physics intact
    _, env_cfg, algo_cfg = load_preset(
        name, overrides={"n_rollout_threads": 4, "ppo_epoch": 2, "max_ep_len": 8}
    )
    algo = MAPPO(algo_cfg, env_cfg)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert bool(jax.numpy.isfinite(metrics.reward))
    assert bool(jax.numpy.isfinite(metrics.value_loss))


def test_maddpg_config_mapping():
    import os

    from dcc_tpu.configs import load
    from dcc_tpu.configs.loader import _CFG_DIR

    cfg, _, _ = load(
        overrides={"batch_size": 64, "hidden_sizes_mlp": [32, 32]},
        algo_yaml=os.path.join(_CFG_DIR, "algo_config", "maddpg.yaml"),
    )
    mcfg = to_maddpg_config(cfg)
    assert mcfg.batch_size == 64 and mcfg.hidden_sizes == (32, 32)
    assert mcfg.critic_lr == 1e-3 and mcfg.tau == 0.01


def test_loader_maps_update_chunks_and_dtype():
    """update_chunks / compute_dtype yaml keys reach MAPPOConfig (both used
    to be constructor-only), and the 16k preset requests chunked updates."""
    _, _, algo_cfg = load({"update_chunks": 4, "compute_dtype": "bfloat16"})
    assert algo_cfg.update_chunks == 4
    assert algo_cfg.compute_dtype == "bfloat16"
    _, _, a16 = load_preset("20uav_16k_dist")
    assert a16.update_chunks == 4 and a16.use_remat
    assert a16.fused_trunk == "auto"
