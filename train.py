"""CLI entry: train MAPPO on the coverage env (TPU-native).

Reference equivalent: ``train.py`` (loads yaml configs, builds Learner, runs
train). Here any config key from the yaml files can be overridden on the
command line:

    python train.py                         # default 4x20, 200 iters
    python train.py --seed 1 --n-iters 50
    python train.py --num-agents 10 --num-pois 40 --n-rollout-threads 4096
    python train.py --comm-force-scale 5.0  # connectivity preservation on
    python train.py --mesh                  # shard envs over all devices
    python train.py --render-live           # live matplotlib viewer at the
                                            # render interval (workstation)
"""

import argparse
import sys


def parse_overrides(argv):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mesh", action="store_true", help="shard envs over a device mesh")
    parser.add_argument("--env-yaml", default=None)
    parser.add_argument("--algo-yaml", default=None)
    parser.add_argument("--expt-yaml", default=None)
    args, unknown = parser.parse_known_args(argv)

    overrides = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument: {tok}")
        key = tok[2:].replace("-", "_")
        if i + 1 >= len(unknown) or unknown[i + 1].startswith("--"):
            overrides[key] = True
            i += 1
        else:
            val = unknown[i + 1]
            for cast in (int, float):
                try:
                    val = cast(val)
                    break
                except ValueError:
                    continue
            if val in ("true", "True"):
                val = True
            elif val in ("false", "False"):
                val = False
            overrides[key] = val
            i += 2
    return args, overrides


def main(argv=None):
    args, overrides = parse_overrides(sys.argv[1:] if argv is None else argv)
    from dcc_tpu.runtime.learner import Learner

    learner = Learner(
        overrides,
        use_mesh=args.mesh,
        env_yaml=args.env_yaml,
        algo_yaml=args.algo_yaml,
        expt_yaml=args.expt_yaml,
    )
    learner.train()


if __name__ == "__main__":
    main()
