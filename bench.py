#!/usr/bin/env python
"""Driver entry point: delegates to dvda_tpu.cli.bench (the packaged
benchmark).  Prints ONE JSON line with the headline metric."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dvda_tpu.cli.bench import main

if __name__ == "__main__":
    main()
