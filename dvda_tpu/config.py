"""Pipeline configuration.

The reference's configuration is compile-time Makefile flags plus CLI
getopt options (SURVEY §5).  The rebuild uses one dataclass covering the
whole pipeline, overridable from the environment:

    =============================  =====================================
    env var                        effect
    =============================  =====================================
    ``DVDA_TPU_DISABLE_DEVICE=1``  host-only decode (numpy/Python spec)
    ``DVDA_TPU_DISABLE_NATIVE=1``  skip the C++ parser (Python planner)
    ``DVDA_TPU_LOG=<level>``       log level (utils/log.py)
    =============================  =====================================
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = ["DecodeConfig", "default_config"]


@dataclass
class DecodeConfig:
    #: run the device (JAX) kernels; False = pure host decode
    use_device: bool = True
    #: use the native C++ host parser when available
    use_native: bool = True
    #: sectors per host I/O batch when walking a track
    io_batch_sectors: int = 4096
    #: decrypt CPPM-protected sectors when a device/MKB is available
    decrypt: bool = True
    #: keep CCI copy-control bytes instead of zeroing them (cppm)
    preserve_cci: bool = False

    @classmethod
    def from_env(cls) -> "DecodeConfig":
        return cls(
            use_device=os.environ.get("DVDA_TPU_DISABLE_DEVICE", "0") != "1",
            use_native=os.environ.get("DVDA_TPU_DISABLE_NATIVE", "0") != "1",
        )


def default_config() -> DecodeConfig:
    return DecodeConfig.from_env()
