from nextou_tpu.utils.init import fast_init
