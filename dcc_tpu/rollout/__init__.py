# rollout lives inside dcc_tpu.algos.mappo (MAPPO.rollout, a lax.scan over
# the vmapped env); this package is reserved for standalone rollout drivers.
