from .mesh import create_mesh, batch_sharding, replicated, shard_batch, replicate
from .sharded_hmm import forward_sharded
