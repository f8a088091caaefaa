"""Warm-prove phase profile of the flagship shape on the current backend."""
import os, sys, time, json
os.environ["ZKTPU_TRACE"] = "1"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import tracing

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 19
width = int(sys.argv[2]) if len(sys.argv) > 2 else 130
cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=40, final_fri_size=512)
ir = fl.flagship_ir(log_n=log_n, width=width)
setup = fl.flagship_setup(ir, cfg)
witness = fl.flagship_witness(ir)
t0 = time.time(); proof = pk.prove(ir, setup, witness, cfg); t1 = time.time()
print("PASS1", round(t1-t0,2), flush=True)
tracing.GLOBAL.spans.clear()
t0 = time.time(); proof = pk.prove(ir, setup, witness, cfg); t2 = time.time()
print("PASS2_WARM", round(t2-t0,2), flush=True)
d = tracing.GLOBAL.flat_durations()
print(json.dumps({k: round(v,2) for k,v in sorted(d.items(), key=lambda x:-x[1])[:25]}, indent=1), flush=True)
