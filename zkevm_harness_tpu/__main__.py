"""CLI: python -m zkevm_harness_tpu <command>

Commands (the reference exposes its tooling as cargo binaries —
geometry_config_generator, circuit_synthesis_performance_test; this is the
equivalent operator surface):

  prove     --log-n N --width W --out proof.json   prove the flagship circuit
  verify    --log-n N --width W --proof proof.json verify a stored proof
  geometry                                         print the geometry config
  bench-kernels                                    per-kernel throughput
"""

from __future__ import annotations

import argparse
import json
import sys


def _cfg(pk):
    return pk.PlonkishConfig(rate=2, cap_size=16, num_queries=40,
                             final_fri_size=64)


def cmd_prove(args):
    from .circuits import flagship as fl
    from .prover import plonkish as pk
    from .utils import serde

    cfg = _cfg(pk)
    ir = fl.flagship_ir(log_n=args.log_n, width=args.width)
    setup = fl.flagship_setup(ir, cfg)
    witness = fl.flagship_witness(ir, seed=args.seed)
    proof = pk.prove(ir, setup, witness, cfg)
    assert pk.verify(ir, setup.vk(), proof, cfg)
    with open(args.out, "w") as f:
        json.dump({"vk": setup.vk(), "proof": serde.proof_to_json(proof)}, f)
    print(f"proof written to {args.out} (verified)")


def cmd_verify(args):
    from .circuits import flagship as fl
    from .prover import plonkish as pk
    from .utils import serde

    cfg = _cfg(pk)
    ir = fl.flagship_ir(log_n=args.log_n, width=args.width)
    with open(args.proof) as f:
        blob = json.load(f)
    proof = serde.proof_from_json(blob["proof"], serde.default_registry())
    ok = pk.verify(ir, [int(v) for v in blob["vk"]], proof, cfg)
    print("VALID" if ok else "INVALID")
    sys.exit(0 if ok else 1)


def cmd_geometry(args):
    from .circuits.capacity import calibrated_cost_models, generate_geometry_config

    cfg = generate_geometry_config(calibrated_cost_models())
    print(json.dumps(cfg.__dict__, indent=1))


def cmd_bench_kernels(args):
    import runpy
    import os
    sys.argv = ["kernel_bench"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "tools",
                                "kernel_bench.py"), run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="zkevm_harness_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prove")
    pp.add_argument("--log-n", type=int, default=8)
    pp.add_argument("--width", type=int, default=16)
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--out", default="proof.json")
    pp.set_defaults(fn=cmd_prove)

    pv = sub.add_parser("verify")
    pv.add_argument("--log-n", type=int, default=8)
    pv.add_argument("--width", type=int, default=16)
    pv.add_argument("--proof", default="proof.json")
    pv.set_defaults(fn=cmd_verify)

    pg = sub.add_parser("geometry")
    pg.set_defaults(fn=cmd_geometry)

    pb = sub.add_parser("bench-kernels")
    pb.set_defaults(fn=cmd_bench_kernels)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
