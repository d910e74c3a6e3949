"""Device kernels.  Importing any op enables the persistent XLA
compilation cache first (utils/jaxcache.py) — every op module compiles
lazily at call time, so this single choke point precedes all compiles."""

from ..utils.jaxcache import ensure_compile_cache

ensure_compile_cache()
