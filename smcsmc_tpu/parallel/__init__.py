from .sharding import make_mesh, shard_pf_state, sharded_step  # noqa: F401
