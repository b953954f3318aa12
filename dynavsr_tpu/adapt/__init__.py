from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
