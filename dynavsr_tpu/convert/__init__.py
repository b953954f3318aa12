from dynavsr_tpu.convert.torch_import import (  # noqa: F401
    convert_state_dict,
    flax_to_torch_key,
    load_torch_checkpoint,
)
