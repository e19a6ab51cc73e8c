from kraken_tpu.parallel.mesh import (make_mesh, shard_batch, replicate, make_infer_fn,
                                      make_train_step, batch_sharding,
                                      pad_batch_to_multiple)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'make_train_step', 'make_infer_fn',
           'batch_sharding', 'pad_batch_to_multiple']
