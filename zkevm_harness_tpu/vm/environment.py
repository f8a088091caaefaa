"""VM environment components: memory, storage, decommitter, events, precompiles.

Parity with the external zk_evm crate's `SimpleMemory`, `InMemoryStorage`,
`SimpleDecommitter`, `InMemoryEventSink`, `DefaultPrecompilesProcessor` as
wired by the reference toolset (src/toolset.rs:23-101, SURVEY L0). Each
component records the typed queries the witness tracer consumes; storage and
events support frame-based rollback (the semantics the callstack handler
needs — src/witness/callstack_handler.rs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..utils.native import keccak256

U256_MASK = (1 << 256) - 1


@dataclasses.dataclass(frozen=True)
class MemoryLocation:
    page: int
    index: int


@dataclasses.dataclass
class MemoryQuery:
    timestamp: int
    location: MemoryLocation
    value: int
    rw_flag: bool  # True = write
    value_is_pointer: bool = False


@dataclasses.dataclass
class LogQuery:
    """Storage/event/L1-message/precompile log record (zk_evm LogQuery)."""

    timestamp: int
    tx_number_in_block: int
    aux_byte: int  # 0 storage, 1 event, 2 l1 msg, 3 precompile
    shard_id: int
    address: int
    key: int
    read_value: int
    written_value: int
    rw_flag: bool
    rollback: bool = False
    is_service: bool = False


AUX_BYTE_STORAGE = 0
AUX_BYTE_EVENT = 1
AUX_BYTE_L1_MESSAGE = 2
AUX_BYTE_PRECOMPILE = 3


@dataclasses.dataclass
class DecommittmentQuery:
    hash: int
    timestamp: int
    memory_page: int
    decommitted_length: int
    is_fresh: bool


class SimpleMemory:
    """Paged word memory (32-byte words), pointer-tagged."""

    def __init__(self):
        self.pages: Dict[int, Dict[int, Tuple[int, bool]]] = {}
        self._next_page = 8  # low pages reserved (code/heap bootstrap)

    def new_page(self) -> int:
        p = self._next_page
        self._next_page += 1
        return p

    def read(self, page: int, index: int) -> Tuple[int, bool]:
        return self.pages.get(page, {}).get(index, (0, False))

    def write(self, page: int, index: int, value: int, is_pointer: bool = False):
        self.pages.setdefault(page, {})[index] = (value & U256_MASK, is_pointer)

    def populate_page(self, page: int, words: List[int]):
        for i, w in enumerate(words):
            self.write(page, i, w)


class InMemoryStorage:
    """Word storage keyed (shard, address, key) with frame rollback."""

    def __init__(self):
        self.inner: Dict[Tuple[int, int, int], int] = {}
        self.frames: List[List[Tuple[Tuple[int, int, int], int]]] = [[]]

    def read(self, shard: int, address: int, key: int) -> int:
        return self.inner.get((shard, address, key), 0)

    def write(self, shard: int, address: int, key: int, value: int) -> int:
        k = (shard, address, key)
        old = self.inner.get(k, 0)
        self.frames[-1].append((k, old))
        self.inner[k] = value & U256_MASK
        return old

    def start_frame(self):
        self.frames.append([])

    def finish_frame(self, panicked: bool):
        journal = self.frames.pop()
        if panicked:
            for k, old in reversed(journal):
                self.inner[k] = old
        else:
            self.frames[-1].extend(journal)


class SimpleDecommitter:
    """Bytecode store keyed by versioned hash (zk_evm SimpleDecommitter)."""

    def __init__(self):
        self.known: Dict[int, List[int]] = {}
        self.decommitted: Dict[int, int] = {}  # hash -> memory page

    def populate(self, pairs: List[Tuple[int, List[int]]]):
        for h, words in pairs:
            self.known[h] = list(words)

    def decommit(self, h: int, memory: SimpleMemory, timestamp: int
                 ) -> Tuple[DecommittmentQuery, Optional[List[int]]]:
        words = self.known.get(h)
        assert words is not None, f"unknown code hash {h:#x}"
        if h in self.decommitted:
            page = self.decommitted[h]
            return DecommittmentQuery(h, timestamp, page, len(words), False), None
        page = memory.new_page()
        memory.populate_page(page, words)
        self.decommitted[h] = page
        return DecommittmentQuery(h, timestamp, page, len(words), True), words


class InMemoryEventSink:
    """Events + L1 messages with frame rollback (zk_evm InMemoryEventSink)."""

    def __init__(self):
        self.frames: List[List[LogQuery]] = [[]]
        self.rollbacks: List[List[LogQuery]] = [[]]

    def add(self, query: LogQuery):
        self.frames[-1].append(query)
        rb = dataclasses.replace(query, rollback=True)
        self.rollbacks[-1].append(rb)

    def start_frame(self):
        self.frames.append([])
        self.rollbacks.append([])

    def finish_frame(self, panicked: bool):
        f = self.frames.pop()
        r = self.rollbacks.pop()
        if panicked:
            pass  # forward entries cancelled by their rollbacks
        else:
            self.frames[-1].extend(f)
            self.rollbacks[-1].extend(r)

    def events_and_l1_messages(self) -> Tuple[List[LogQuery], List[LogQuery]]:
        assert len(self.frames) == 1
        events = [q for q in self.frames[0] if q.aux_byte == AUX_BYTE_EVENT]
        msgs = [q for q in self.frames[0] if q.aux_byte == AUX_BYTE_L1_MESSAGE]
        return events, msgs


class DefaultPrecompilesProcessor:
    """keccak256 / sha256 / ecrecover precompile dispatch by address.

    The reference processes precompile calls out-of-circuit and records the
    round-function traffic for the dedicated circuits (keccak 293/sha 2206/
    ecrecover 7 cycles-per-circuit capacities). Round 1 executes the hashes;
    per-round witness capture hooks in with the decomposers.
    """

    KECCAK_ADDRESS = 0x8010
    SHA256_ADDRESS = 0x8002
    ECRECOVER_ADDRESS = 0x8001

    def __init__(self):
        self.calls: List[Tuple[int, bytes, bytes]] = []

    def process(self, address: int, data: bytes) -> bytes:
        import hashlib
        if address == self.KECCAK_ADDRESS:
            out = keccak256(data)
        elif address == self.SHA256_ADDRESS:
            out = hashlib.sha256(data).digest()
        elif address == self.ECRECOVER_ADDRESS:
            # data = msg_hash(32) || v(32) || r(32) || s(32)
            from ..utils.secp256k1 import ecrecover_address
            assert len(data) == 128, "ecrecover input must be 128 bytes"
            addr = ecrecover_address(
                data[:32], int.from_bytes(data[32:64], "big"),
                int.from_bytes(data[64:96], "big"),
                int.from_bytes(data[96:128], "big"))
            out = (b"\x00" * 32 if addr is None
                   else b"\x00" * 12 + addr)
        else:
            raise NotImplementedError(f"precompile {address:#x}")
        self.calls.append((address, data, out))
        return out
