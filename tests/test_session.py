

def test_mem_bytes_explicit_byte_suffix_stays_bytes():
    from engine.session import _mem_bytes

    assert _mem_bytes("4294967296b") == 4294967296  # bytes, not MiB*bytes
    assert _mem_bytes("512") == 512 * (1 << 20)  # unitless -> MiB
    assert _mem_bytes("4g") == 4 * (1 << 30)
    assert _mem_bytes("1gb") == 1 << 30
