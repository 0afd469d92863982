from .mesh import make_mesh, shard_batch_for_mesh, make_sharded_train_step

__all__ = ["make_mesh", "shard_batch_for_mesh", "make_sharded_train_step"]
