"""Bit-exact queue encodings: layout pins, injectivity, limb bounds.

Pins the packings of witness/encodings.py against hand-computed layouts from
the reference (circuit_encodings/src/{memory_query,log_query,
decommittment_request,recursion_request}.rs)."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops.goldilocks import P
from zkevm_harness_tpu.vm.environment import (DecommittmentQuery, LogQuery,
                                              MemoryLocation, MemoryQuery)
from zkevm_harness_tpu.witness import encodings as enc


def _rand_memory_query(rng):
    return MemoryQuery(
        timestamp=int(rng.integers(0, 2**32)),
        location=MemoryLocation(int(rng.integers(0, 2**32)),
                                int(rng.integers(0, 2**32))),
        value=int.from_bytes(rng.integers(0, 256, size=32, dtype=np.uint8)
                             .tobytes(), "big"),
        rw_flag=bool(rng.integers(0, 2)),
        value_is_pointer=bool(rng.integers(0, 2)))


def _rand_log_query(rng):
    return LogQuery(
        timestamp=int(rng.integers(0, 2**32)),
        tx_number_in_block=int(rng.integers(0, 2**16)),
        aux_byte=int(rng.integers(0, 4)),
        shard_id=int(rng.integers(0, 2)),
        address=int(rng.integers(0, 2**63)) | (int(rng.integers(0, 2**63)) << 63),
        key=int.from_bytes(rng.integers(0, 256, size=32, dtype=np.uint8)
                           .tobytes(), "big"),
        read_value=int.from_bytes(rng.integers(0, 256, size=32, dtype=np.uint8)
                                  .tobytes(), "big"),
        written_value=int.from_bytes(rng.integers(0, 256, size=32,
                                                  dtype=np.uint8).tobytes(), "big"),
        rw_flag=bool(rng.integers(0, 2)),
        rollback=bool(rng.integers(0, 2)),
        is_service=bool(rng.integers(0, 2)))


def test_memory_query_layout():
    q = MemoryQuery(timestamp=7, location=MemoryLocation(3, 5),
                    value=(0xAABBCCDD << (32 * 7)) | 0x11223344,
                    rw_flag=True, value_is_pointer=False)
    e = enc.encode_memory_query(q)
    assert len(e) == enc.MEMORY_QUERY_PACKED_WIDTH == 8
    assert e[0] == 7 and e[1] == 3
    assert e[2] == 5 | (1 << 32)  # index + rw_flag at bit 32
    assert e[3] & ((1 << 32) - 1) == 0x11223344  # value word 0
    # word 7 = 0xAABBCCDD, le bytes DD CC BB AA land in v5 bit48 / v6
    assert (e[5] >> 48) & 0xFF == 0xDD
    assert (e[6] >> 32) & 0xFF == 0xCC
    assert (e[6] >> 40) & 0xFF == 0xBB
    assert (e[6] >> 48) & 0xFF == 0xAA
    assert e[7] == 0  # value word 4


def test_memory_query_roundtrip_and_bounds(rng):
    for _ in range(50):
        q = _rand_memory_query(rng)
        e = enc.encode_memory_query(q)
        assert all(0 <= v < (1 << 56) < P for v in e[2:3] + e[3:7])
        assert all(0 <= v < P for v in e)
        ts, page, index, rw, ptr, value = enc.decode_memory_query_fields(e)
        assert (ts, page, index, rw, ptr, value) == (
            q.timestamp, q.location.page, q.location.index, q.rw_flag,
            q.value_is_pointer, q.value)


def test_log_query_layout():
    q = LogQuery(timestamp=9, tx_number_in_block=2, aux_byte=1, shard_id=0,
                 address=0xFFEE, key=0xAB, read_value=5, written_value=6,
                 rw_flag=True, rollback=True, is_service=True)
    e = enc.encode_log_query(q)
    assert len(e) == enc.LOG_QUERY_PACKED_WIDTH == 20
    assert e[0] == 5 | (0xAB << 32)   # rv[0] + key byte 0 at bit 32
    assert e[8] == 6                  # wv[0], key bytes 24..26 are zero
    # address LE byte 0 = 0xEE in v10 bit 48; byte 1 = 0xFF in v11 bit 32
    assert (e[10] >> 48) & 0xFF == 0xEE
    assert (e[11] >> 32) & 0xFF == 0xFF
    assert e[16] == 9                 # timestamp (addr bytes 16.. are zero)
    assert e[17] == 2 | (1 << 40)     # tx + aux_byte at bit 40
    assert e[18] == 1 + 2             # rw + 2*is_service
    assert e[19] == 1                 # rollback


def test_log_query_injective(rng):
    seen = {}
    for _ in range(200):
        q = _rand_log_query(rng)
        key = tuple(enc.encode_log_query(q))
        assert all(0 <= v < (1 << 57) for v in key)
        assert key not in seen or seen[key] == q
        seen[key] = q
    # single-field perturbations must change the encoding
    q = _rand_log_query(rng)
    base = tuple(enc.encode_log_query(q))
    import dataclasses
    for field, newval in [("timestamp", q.timestamp ^ 1),
                          ("address", q.address ^ (1 << 159)),
                          ("key", q.key ^ (1 << 255)),
                          ("read_value", q.read_value ^ 1),
                          ("written_value", q.written_value ^ (1 << 255)),
                          ("rw_flag", not q.rw_flag),
                          ("rollback", not q.rollback),
                          ("is_service", not q.is_service),
                          ("shard_id", q.shard_id ^ 1),
                          ("aux_byte", q.aux_byte ^ 1),
                          ("tx_number_in_block", q.tx_number_in_block ^ 1)]:
        q2 = dataclasses.replace(q, **{field: newval})
        assert tuple(enc.encode_log_query(q2)) != base, field


def test_timestamped_log_query():
    q = LogQuery(timestamp=1, tx_number_in_block=0, aux_byte=0, shard_id=0,
                 address=1, key=1, read_value=0, written_value=0,
                 rw_flag=False, rollback=True)
    e = enc.encode_timestamped_log_query(q, 77)
    base = enc.encode_log_query(q)
    assert e[:19] == base[:19]
    assert e[19] == base[19] + (77 << enc.EXTENDED_TIMESTAMP_ENCODING_OFFSET)


def test_decommittment_request_layout():
    q = DecommittmentQuery(hash=(1 << 255) | 0xDEAD, timestamp=0x01020304,
                           memory_page=0x0A0B0C0D, decommitted_length=4,
                           is_fresh=True)
    e = enc.encode_decommittment_request(q)
    assert len(e) == 8
    assert e[0] & ((1 << 32) - 1) == 0xDEAD
    # page LE bytes 0D 0C 0B land in v0 bits 32/40/48; byte 0A in v1 bit 32
    assert (e[0] >> 32) & 0xFF == 0x0D
    assert (e[0] >> 40) & 0xFF == 0x0C
    assert (e[0] >> 48) & 0xFF == 0x0B
    assert (e[1] >> 32) & 0xFF == 0x0A
    # timestamp LE bytes 04 03 in v1 bits 40/48; 02 01 in v2 bits 32/40
    assert (e[1] >> 40) & 0xFF == 0x04
    assert (e[1] >> 48) & 0xFF == 0x03
    assert (e[2] >> 32) & 0xFF == 0x02
    assert (e[2] >> 40) & 0xFF == 0x01
    assert (e[2] >> 48) & 0x1 == 1  # is_fresh
    assert e[7] == (1 << 255) >> (32 * 7)  # hash word 7


def test_recursion_request_and_keys(rng):
    e = enc.encode_recursion_request(4, (1, 2, 3, 4))
    assert e == [4, 1, 2, 3, 4, 0, 0, 0]
    q = _rand_memory_query(rng)
    sk = enc.memory_sorting_key(q)
    assert sk == ((q.location.page << 64) | (q.location.index << 32)
                  | q.timestamp)
    lq = _rand_log_query(rng)
    ck = enc.log_comparison_key(lq)
    assert ck == (lq.address << 256) | lq.key


def test_l2_to_l1_serialization():
    q = LogQuery(timestamp=0, tx_number_in_block=0x1234, aux_byte=2,
                 shard_id=5, address=0xAA, key=0xBB, read_value=0,
                 written_value=0xCC, rw_flag=True, is_service=True)
    b = enc.serialize_l2_to_l1_message(q)
    assert len(b) == 88
    assert b[0] == 5 and b[1] == 1
    assert b[2:4] == bytes([0x12, 0x34])
    assert b[23] == 0xAA   # address BE, last byte
    assert b[55] == 0xBB   # key BE, last byte
    assert b[87] == 0xCC   # written value BE, last byte


def test_state_diff_record():
    b = enc.encode_state_diff_record(
        address=1, key=2, derived_key=b"\x03" * 32, enumeration_index=4,
        initial_value=5, final_value=6)
    assert len(b) == 156
    assert b[19] == 1 and b[51] == 2 and b[52] == 3 and b[83] == 3
    assert b[91] == 4 and b[123] == 5 and b[155] == 6
