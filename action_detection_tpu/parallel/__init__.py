from .mesh import (make_mesh, batch_sharding, replicated, shard_batch,
                   replicate, initialize_multihost, select_devices, DATA_AXIS)
