from .sharding import make_mesh, ct_sharding, shard_ciphertext  # noqa: F401
