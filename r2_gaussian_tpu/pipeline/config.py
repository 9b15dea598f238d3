"""Config/flag system: declarative param groups -> argparse, YAML override
with recursive inherit_from, cfg_args provenance (reference
arguments/__init__.py + utils/argument_utils.py + utils/cfg_utils.py).

Defaults are identical to the reference so trained results are comparable.
"""

from __future__ import annotations

import os.path as osp
from argparse import ArgumentParser, Namespace

import yaml


class ParamGroup:
    """Reflects instance attributes into an argparse group. A leading '_' in
    the attribute name also registers a one-letter shorthand flag
    (reference argument_utils.py:10-40)."""

    def __init__(self, parser: ArgumentParser, name: str, fill_none=False):
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = False
            if key.startswith("_"):
                shorthand = True
                key = key[1:]
            t = type(value)
            # an attribute whose default is None has no inferable type; flags
            # like --max_scale are numeric fractions -> float
            arg_type = t if value is not None else float
            value = value if not fill_none else None
            names = [f"--{key}"] + ([f"-{key[0:1]}"] if shorthand else [])
            if t is bool:
                group.add_argument(*names, default=value, action="store_true")
            elif t is list:
                group.add_argument(*names, default=value, nargs="+",
                                   type=type(value[0]) if value else str)
            else:
                group.add_argument(*names, default=value, type=arg_type)

    def extract(self, args) -> Namespace:
        out = Namespace()
        for key in vars(self):
            key = key.lstrip("_")
            if hasattr(args, key):
                setattr(out, key, getattr(args, key))
        return out


class ModelParams(ParamGroup):
    def __init__(self, parser, sentinel=False):
        self._source_path = ""
        self._model_path = ""
        self.ply_path = ""
        self.scale_min = 0.0005  # fraction of volume size
        self.scale_max = 0.5  # fraction of volume size
        self.eval = True
        super().__init__(parser, "Loading Parameters", sentinel)

    def extract(self, args):
        g = super().extract(args)
        g.source_path = osp.abspath(g.source_path)
        return g


class PipelineParams(ParamGroup):
    def __init__(self, parser):
        self.backend = "auto"  # auto | dense | pallas
        self.footprint = "tight"  # tight | tile (tile = reference-exact)
        self.debug = False
        super().__init__(parser, "Pipeline Parameters")


class OptimizationParams(ParamGroup):
    def __init__(self, parser):
        self.iterations = 30_000
        self.position_lr_init = 0.0002
        self.position_lr_final = 0.00002
        self.position_lr_max_steps = 30_000
        self.density_lr_init = 0.01
        self.density_lr_final = 0.001
        self.density_lr_max_steps = 30_000
        self.scaling_lr_init = 0.005
        self.scaling_lr_final = 0.0005
        self.scaling_lr_max_steps = 30_000
        self.rotation_lr_init = 0.001
        self.rotation_lr_final = 0.0001
        self.rotation_lr_max_steps = 30_000
        self.lambda_dssim = 0.25
        self.lambda_tv = 0.05
        self.tv_vol_size = 32
        self.density_min_threshold = 0.00001
        self.densification_interval = 100
        self.densify_from_iter = 500
        self.densify_until_iter = 15000
        self.densify_grad_threshold = 5.0e-5
        self.densify_scale_threshold = 0.1  # fraction of volume size
        self.max_screen_size = None
        self.max_scale = None  # fraction of volume size
        self.max_num_gaussians = 500_000
        # Polyak/EMA averaging of the parameters for evaluation and saved
        # models (framework extension beyond the reference; 0 = off =
        # reference behavior). A decay around 0.999 counters measurement-
        # noise semiconvergence: late-iteration noise fitting averages out
        # while the converged signal remains (see RESULTS.md).
        self.ema_decay = 0.0
        # initial padded-buffer capacity (0 = auto: pow2 >= max(16384, N)).
        # XLA needs static shapes, so gaussians live in padded SoA buffers;
        # smaller caps save compute on small scenes at the cost of an extra
        # recompile tier when densification grows past them.
        self.initial_capacity = 0
        super().__init__(parser, "Optimization Parameters")


def load_yaml_config(path: str) -> dict:
    """YAML config with recursive inherit_from merging
    (reference cfg_utils.py:14-61)."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    parent = cfg.pop("inherit_from", None)
    if parent:
        base = load_yaml_config(
            parent if osp.isabs(parent) else osp.join(osp.dirname(path), parent)
        )
        base.update(cfg)
        return base
    return cfg


def save_cfg_args(model_path: str, args: Namespace):
    """Write the `cfg_args` provenance file the reference writes and later
    eval()s back (log_utils.py:31-37, arguments/__init__.py:81-89)."""
    import os

    os.makedirs(model_path, exist_ok=True)
    with open(osp.join(model_path, "cfg_args"), "w") as f:
        f.write(repr(args))
    with open(osp.join(model_path, "cfg_args.yml"), "w") as f:
        yaml.dump(vars(args), f, default_flow_style=False)


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """CLI args merged over a model dir's saved cfg_args
    (reference arguments/__init__.py:75-95)."""
    args_cmdline = parser.parse_args(argv)
    cfg_string = "Namespace()"
    try:
        with open(osp.join(args_cmdline.model_path, "cfg_args")) as f:
            cfg_string = f.read()
    except (TypeError, FileNotFoundError):
        pass
    args_cfg = eval(cfg_string)  # noqa: S307 - reference-compatible provenance
    merged = vars(args_cfg).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
