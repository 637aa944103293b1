#!/usr/bin/env python
"""Fine-tune / evaluate PEneo-TPU on SIBR (reference: start/run_sibr.py —
identical to run_rfund except the dataset class and eval split)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_rfund import main  # noqa: E402

if __name__ == "__main__":
    main(dataset_cls_name="sibr")
