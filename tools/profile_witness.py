"""cProfile of the MainVM witness path (CPU) at capacity 5585."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import cProfile, pstats
from zkevm_harness_tpu.circuits import main_vm_circuit as mvc
from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import (
    DefaultPrecompilesProcessor, InMemoryEventSink, InMemoryStorage,
    SimpleDecommitter, SimpleMemory)
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.vm.state import BlockProperties, ProvingToolset, create_vm
from zkevm_harness_tpu.witness import main_vm as wmv
from zkevm_harness_tpu.witness.tracer import WitnessTracer
from zkevm_harness_tpu.prover import layers as ly

I, R = isa.imm, isa.reg
body = [
    isa.BinOp("add", R(1), I(1), dst=1),
    isa.BinOp("add", R(1), R(2), dst=2),
    isa.Div(R(2), I(7), dst_quot=3, dst_rem=4),
    isa.HeapWrite(I(3), R(2)),
    isa.HeapRead(I(3), 5),
    isa.StorageWrite(I(5), R(5)),
    isa.Event(I(6), R(3)),
    isa.BinOp("sub", R(2), R(3), dst=6),
]
prog = []
for _ in range(697):
    prog.extend(body)
prog += [isa.Nop()] * (5584 - len(prog)) + [isa.Ret()]
tracer = WitnessTracer(10_000)
tools = ProvingToolset(storage=InMemoryStorage(), memory=SimpleMemory(),
                       decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
                       precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
                       geometry=testing_geometry())
vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
t0=time.time(); cycles = run_vm(vm, prog, 10_000); print("run_vm", round(time.time()-t0,2), flush=True)
geo = ly.main_vm_geometry_for_capacity(5585, limb_bits=16)

pr = cProfile.Profile(); pr.enable()
t0=time.time(); art = wmv.compute_main_vm_artifacts(tracer, geo, capacity=5585); t_art=time.time()-t0
inst = art.instances[0]
ir = mvc.main_vm_ir(geo)
t0=time.time(); W = mvc.main_vm_witness(ir, geo, inst); t_fill=time.time()-t0
pr.disable()
print("artifacts", round(t_art,2), "fill", round(t_fill,2), flush=True)
st = pstats.Stats(pr); st.sort_stats("cumulative"); st.print_stats(25)
