from .mesh import data_sharding, make_mesh, replicated
from .pipeline import pipelined_transformer, stack_stage_params, validate_stages
from .sharding import (
    make_param_specs,
    partition_spec_for,
    shard_params,
    sharded_train_step,
)
from .zero import shard_opt_state, zero_opt_shardings, zero_opt_specs

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "make_param_specs",
    "partition_spec_for",
    "shard_params",
    "sharded_train_step",
    "pipelined_transformer",
    "stack_stage_params",
    "validate_stages",
    "shard_opt_state",
    "zero_opt_shardings",
    "zero_opt_specs",
]
