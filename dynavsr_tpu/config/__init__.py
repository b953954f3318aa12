from dynavsr_tpu.config.options import (  # noqa: F401
    NoneDict,
    check_resume,
    dict2str,
    dict_to_nonedict,
    parse,
)
