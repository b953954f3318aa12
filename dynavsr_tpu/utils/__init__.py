from dynavsr_tpu.utils.util import (  # noqa: F401
    ProgressBar,
    enable_compilation_cache,
    get_timestamp,
    mkdir_and_rename,
    mkdirs,
    set_random_seed,
    setup_logger,
)
