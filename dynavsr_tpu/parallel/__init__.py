from dynavsr_tpu.parallel.mesh import data_mesh, shard_batch, replicate
