from nextou_tpu.utils.init import fast_init
from nextou_tpu.utils.cache import enable_compilation_cache
