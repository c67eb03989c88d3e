"""CLI: convert a REFERENCE torch snapshot (.pt) into an eoe_tpu msgpack
snapshot usable with ``--load``.

Parity role: the reference's cross-style snapshot ingestion
(ad_trainer.py:552-615 load/unify_snapshot_style), here as an explicit offline
migration step since torch state dicts cannot be loaded lazily into Flax.

Run: python -m eoe_tpu.main.import_snapshot snapshot_cls0_it0.pt out.msgpack
Supported architectures (sniffed from the state dict): CNN28/CNN32,
WideResNet+CBAM, OpenAI-style CLIP.
"""

import argparse

from eoe_tpu.models.torch_import import import_torch_snapshot


def main(argv=None) -> str:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("input", help="reference torch snapshot (.pt)")
    p.add_argument("output", help="output eoe_tpu snapshot (.msgpack)")
    args = p.parse_args(argv)
    out = import_torch_snapshot(args.input, args.output)
    print(f"Wrote {out}")
    return out


if __name__ == "__main__":
    main()
