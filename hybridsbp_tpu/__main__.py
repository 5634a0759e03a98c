"""CLI: ``python -m hybridsbp_tpu [list | <problem> [key=value ...]]``.

Values are parsed as Python literals when possible (``N=32``,
``sim_years=50.0``, ``method='trace'``).
"""
import ast
import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from hybridsbp_tpu.registry import REGISTRY, get

    if not argv or argv[0] in ("list", "-h", "--help"):
        print("usage: python -m hybridsbp_tpu <problem> [key=value ...]\n")
        for p in REGISTRY.values():
            print(f"  {p.name:16s} {p.description}")
        return 0

    name, *kvs = argv
    kw = {}
    for kv in kvs:
        k, _, v = kv.partition("=")
        try:
            kw[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            kw[k] = v
    get(name).run(**kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
