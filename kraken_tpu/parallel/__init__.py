from kraken_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                      make_train_step, batch_sharding)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'make_train_step',
           'batch_sharding']
