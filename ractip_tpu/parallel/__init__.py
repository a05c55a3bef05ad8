from .distributed import init_distributed
from .mesh import (SCENARIO_AXES, pad_to_mesh, scenario_mesh,
                   scenario_sharding, shard_scenarios, sharded_mean_var)
