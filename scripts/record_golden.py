"""Record golden traces from the torch/numpy reference environment.

Runs the reference DCEnv (``/root/reference/uav_dcc_control``) with recorded
random action sequences and saves per-step obs/reward/done/coverage_rate to
``tests/golden/*.npz``. The committed golden files make the parity tests
(tests/test_env_parity.py) self-contained; this script only needs the
reference mount to regenerate them.

Usage: python scripts/record_golden.py
"""

import os
import sys

import numpy as np

REF = "/root/reference/uav_dcc_control"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _install_shims():
    """Shim the legacy modules the reference imports (gym 0.10, imp) so it can
    run under Python 3.12 without installing anything."""
    import types
    import importlib.util

    if "imp" not in sys.modules:
        imp_mod = types.ModuleType("imp")

        def load_source(name, pathname):
            spec = importlib.util.spec_from_file_location(name or "scenario", pathname)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        imp_mod.load_source = load_source
        sys.modules["imp"] = imp_mod

    if "gym" not in sys.modules:
        gym = types.ModuleType("gym")

        class Env:
            metadata = {}

            def close(self):
                pass

        class Space:
            pass

        class Box(Space):
            def __init__(self, low, high, shape=None, dtype=np.float32):
                if shape is None:
                    shape = np.asarray(low).shape
                self.low, self.high, self.shape, self.dtype = low, high, tuple(shape), dtype

        class Discrete(Space):
            def __init__(self, n):
                self.n = n

        class Tuple(Space):
            def __init__(self, spaces_):
                self.spaces = spaces_

            def __getitem__(self, i):
                return self.spaces[i]

        spaces = types.ModuleType("gym.spaces")
        spaces.Box, spaces.Discrete, spaces.Tuple, spaces.Space = Box, Discrete, Tuple, Space
        spaces_box = types.ModuleType("gym.spaces.box")
        spaces_box.Box = Box
        registration = types.ModuleType("gym.envs.registration")
        registration.register = lambda *a, **k: None
        registration.load = lambda name: None

        class EnvSpec:
            def __init__(self, *a, **k):
                pass

        registration.EnvSpec = EnvSpec
        envs = types.ModuleType("gym.envs")
        envs.registration = registration
        gym.Env, gym.spaces, gym.envs, gym.Space = Env, spaces, envs, Space
        sys.modules["gym"] = gym
        sys.modules["gym.spaces"] = spaces
        sys.modules["gym.spaces.box"] = spaces_box
        sys.modules["gym.envs"] = envs
        sys.modules["gym.envs.registration"] = registration


def record(name, num_agents=4, num_pois=20, comm_force_scale=0.0, comm_r_scale=0.95,
           steps=300, seed=0, action_scale=1.0):
    _install_shims()
    sys.path.insert(0, REF)
    try:
        from envs.mpe.uav_dcc import DCEnv
    finally:
        sys.path.pop(0)

    env = DCEnv(
        scenario="coverage",
        num_agents=num_agents,
        num_pois=num_pois,
        max_ep_len=150,
        r_cover=0.2,
        r_comm=0.4,
        comm_r_scale=comm_r_scale,
        comm_force_scale=comm_force_scale,
    )
    # Reference quirk #1 (SURVEY.md 2.4): Scenario.make_world builds
    # CoverageWorld() without forwarding comm_r_scale/comm_force_scale
    # (scenarios/coverage.py:34), so the connectivity force is dead in every
    # shipped code path. Wire it explicitly so the golden trace captures the
    # *intended* branchy pull-force behavior for parity-testing our masked
    # implementation.
    world = env.env.world
    world.contact_force = 1e2 * comm_force_scale
    world.comm_r_scale = comm_r_scale
    rng = np.random.RandomState(seed)
    obs0 = np.array(env.reset())
    actions, obs_l, rew_l, done_l, cr_l = [], [], [], [], []
    for t in range(steps):
        a = rng.uniform(-1, 1, (num_agents, 2)) * action_scale
        # NB: the reference's _set_action scales the action array in place
        # (environment.py:181-190 binds u to the row then does `u *= 5`), so
        # step on a copy to keep the recorded action pristine.
        obs, rew, done, info = env.step(a.copy())
        actions.append(a)
        obs_l.append(np.array(obs))
        rew_l.append(np.array(rew))
        done_l.append(np.array(done))
        cr_l.append(info["coverage_rate"])
        if np.all(done):
            obs0_next = np.array(env.reset())
            # match the worker protocol: caller would see the reset obs
            obs_l[-1] = obs_l[-1]  # golden keeps pre-reset obs; reset tested separately
            break
    np.savez(
        os.path.join(OUT, name + ".npz"),
        obs0=obs0,
        actions=np.array(actions),
        obs=np.array(obs_l),
        rewards=np.array(rew_l),
        dones=np.array(done_l),
        coverage_rate=np.array(cr_l),
        num_agents=num_agents,
        num_pois=num_pois,
        comm_force_scale=comm_force_scale,
        comm_r_scale=comm_r_scale,
    )
    print(f"{name}: {len(actions)} steps recorded")


def main():
    os.makedirs(OUT, exist_ok=True)
    # default config: connectivity force off (dcc.yaml:5-12)
    record("default_4x20", steps=300, seed=0)
    # connectivity-preservation force on (BASELINE config #2 analog)
    record("connect_4x20", comm_force_scale=5.0, comm_r_scale=0.9, steps=300, seed=1)
    # small-action trace keeping agents clustered (exercises case-2 pull force)
    record("connect_smallact_4x20", comm_force_scale=5.0, comm_r_scale=0.9,
           steps=200, seed=2, action_scale=0.2)


if __name__ == "__main__":
    main()
