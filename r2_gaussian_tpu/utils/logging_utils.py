"""Output directory + TensorBoard setup (reference utils/log_utils.py)."""

from __future__ import annotations

import os
import os.path as osp
import uuid


def prepare_output_and_logger(args):
    """Pick/create the model dir, persist cfg_args, return a TB writer
    (or None)."""
    from ..pipeline.config import save_cfg_args

    if not getattr(args, "model_path", None):
        unique = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())[:10]
        args.model_path = osp.join("./output/", unique)
    os.makedirs(args.model_path, exist_ok=True)
    save_cfg_args(args.model_path, args)
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(args.model_path)
    except ImportError:
        print("tensorboardX not available: not logging progress")
        return None
