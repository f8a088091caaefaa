"""Test-artifact infra: JSON roundtrip + predeploy + far-call execution."""

from zkevm_harness_tpu.utils import test_artifacts as ta
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.witness.tree import SparseStorageTree
from tests.test_vm import make_vm

I = isa.imm
R = isa.reg


def make_artifact():
    callee = [isa.StorageWrite(I(1), I(500)), isa.Ret()]
    entry = [isa.FarCall(I(0xCAFE), exception_handler=2), isa.Ret(), isa.Ret()]
    return ta.TestArtifact(entry_point_address=0xAA, entry_point_code=entry,
                           predeployed_contracts={0xCAFE: callee})


def test_artifact_json_roundtrip(tmp_path):
    art = make_artifact()
    path = str(tmp_path / "artifact.json")
    ta.save_artifact(art, path)
    back = ta.load_artifact(path)
    assert back.entry_point_address == 0xAA
    assert back.entry_point_code == art.entry_point_code
    assert back.predeployed_contracts == art.predeployed_contracts


def test_predeploy_and_run(tmp_path):
    art = make_artifact()
    path = str(tmp_path / "artifact.json")
    ta.save_artifact(art, path)
    art2 = ta.load_artifact(path)

    vm, tracer, tools = make_vm()
    tree = SparseStorageTree()
    hashes = ta.save_predeployed_contracts(tools, tree, art2)
    assert 0xCAFE in hashes
    root_before = tree.root
    run_vm(vm, art2.entry_point_code, 100)
    assert vm.finished
    assert tools.storage.read(0, 0xCAFE, 1) == 500
    assert root_before != SparseStorageTree().root  # deployer slot in tree
