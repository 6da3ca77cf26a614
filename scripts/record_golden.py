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

# (old, new) source replacements applied by the imp shim when it loads the
# scenario file — the ctor-patch channel for reference quirk #1
# (scenarios/coverage.py:40-41 hardcodes num_agents=4/num_landmarks=20,
# ignoring the Scenario ctor values; see SURVEY.md 2.4). The patched source
# is still the REFERENCE's code, executed in place — this harness only
# redirects the two hardcoded counts at the ctor values so N!=4 golden
# traces exercise the reference's own physics.
SOURCE_PATCHES = []


def _install_shims():
    """Shim the legacy modules the reference imports (gym 0.10, imp) so it can
    run under Python 3.12 without installing anything."""
    import types
    import importlib.util

    if "imp" not in sys.modules:
        imp_mod = types.ModuleType("imp")

        def load_source(name, pathname):
            with open(pathname) as f:
                src = f.read()
            for old, new in SOURCE_PATCHES:
                assert old in src, f"source patch target missing: {old!r}"
                src = src.replace(old, new)
            mod = types.ModuleType(name or "scenario")
            mod.__file__ = pathname  # scenario resolves pos_pois.npy via it
            exec(compile(src, pathname, "exec"), mod.__dict__)
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

    SOURCE_PATCHES.clear()
    if (num_agents, num_pois) != (4, 20):
        # route the make_world hardcodes to the ctor values (quirk #1)
        SOURCE_PATCHES.extend(
            [
                ("num_agents = 4\n", "num_agents = self.num_agents\n"),
                ("num_landmarks = 20\n", "num_landmarks = self.num_pois\n"),
            ]
        )
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
    if num_agents != 4:
        # Reference quirk #2 (SURVEY.md 2.4): CoverageWorld preallocates its
        # distance/adjacency matrices 4x4 (CoverageWorld.py:11-21) — N!=4
        # would IndexError in update_connect. Re-allocate at the real count
        # (done before any step, so no state is lost).
        n = len(world.agents)
        assert n == num_agents, "make_world patch did not take"
        world.dist_mat = np.zeros([n, n])
        world.adj_mat = np.zeros([n, n])
        world.adj_mat_ = np.zeros([n, n])
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
    # N!=4 traces through the ctor-patched reference (BASELINE configs #2/#3
    # demand 5/10/20-agent variants; the reference's own physics is the
    # ground truth once the make_world hardcode is redirected)
    record("default_5x10", num_agents=5, num_pois=10, steps=300, seed=3)
    record("connect_5x10", num_agents=5, num_pois=10, comm_force_scale=5.0,
           comm_r_scale=0.9, steps=200, seed=4, action_scale=0.2)
    record("default_10x20", num_agents=10, num_pois=20, steps=200, seed=5)


if __name__ == "__main__":
    main()
