"""Training CLI — the analog of ``python train.py`` in the reference
(/root/reference/train.py:178-179), with explicit flags instead of editing
a class body (the reference's ``Opt``, train.py:20-48).

Every Opt field is overridable: ``python train.py --model s2vt --lr 1e-4
--batch_size 16 --EPOCHS 300``. A JSON config (--config, as written by
``save_opt``) provides the base values.
"""

from __future__ import annotations

import argparse
import dataclasses

from s2vt_tpu.config import Opt, load_opt


def add_opt_flags(ap: argparse.ArgumentParser, opt: Opt) -> None:
    for f in dataclasses.fields(Opt):
        if f.name == "start_time":
            continue
        val = getattr(opt, f.name)
        if isinstance(val, bool):
            ap.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                            ("1", "true", "yes"), default=None, metavar="BOOL")
        elif isinstance(val, (int, float, str)):
            ap.add_argument(f"--{f.name}", type=type(val), default=None)
        elif isinstance(val, tuple):
            ap.add_argument(f"--{f.name}", type=lambda s: tuple(
                int(x) for x in s.split(",")), default=None, metavar="N,M")


def opt_from_args(args: argparse.Namespace, base: Opt) -> Opt:
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k not in ("config",)}
    return base.replace(**overrides)


def main():
    from s2vt_tpu.utils.compilation import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", type=str, default=None,
                    help="JSON config file (an opt.json written by save_opt)")
    add_opt_flags(ap, Opt())
    args = ap.parse_args()

    base = load_opt(args.config) if args.config else Opt()
    opt = opt_from_args(args, base)

    from s2vt_tpu.parallel import mesh as mesh_lib
    from s2vt_tpu.training.loop import Trainer

    mesh = mesh_lib.make_mesh(opt.mesh_shape) if opt.mesh_shape != (1, 1) \
        else mesh_lib.make_mesh()
    trainer = Trainer(opt, mesh=mesh)
    history = trainer.fit()
    print(f"finished after {len(history['train_loss'])} epochs; "
          f"best valid loss {min(history['valid_loss']):.4f}")


if __name__ == "__main__":
    main()
