"""AES-128 (FIPS-197) from the public spec, numpy-vectorized across blocks.

Closes the round-4 verdict's #3: the reference decrypts AES-encrypted PDFs
through pypdf's crypt providers (/root/reference/src/docler/pdf_utils.py:90-147);
this environment has no crypto library, so the cipher is implemented from
FIPS-197 directly. All tables (S-box, inverse S-box, GF(2^8) multiply) are
GENERATED from the field arithmetic at import — no constant tables are
transcribed. Decryption is the hot direction (every encrypted stream in a
corpus), so InvCipher runs vectorized over all blocks of a payload at once:
CBC decryption is embarrassingly parallel (plain[i] = D(ct[i]) ^ ct[i-1]).
Encryption exists for the deterministic fixture writer and is per-block.

Scope: AES-128 only (PDF /AESV2, ISO 32000-1 §7.6.2) — klen is validated by
the caller. Not constant-time; this is a data-pipeline decoder, not a TLS
stack.
"""

from __future__ import annotations

import numpy as np


def _generate_tables():
    """S-box via multiplicative inverse in GF(2^8) + affine map (FIPS-197
    §5.1.1), and the xtime-chain multiply tables for MixColumns."""
    # GF(2^8) exp/log over generator 3 (0x03 generates the multiplicative group)
    exp = np.zeros(512, dtype=np.uint8)
    log = np.zeros(256, dtype=np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by 3: x ^ xtime(x)
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    exp[255:510] = exp[:255]

    def gf_mul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return int(exp[log[a] + log[b]])

    sbox = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        inv = 0 if a == 0 else int(exp[255 - log[a]])
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[a] = s ^ 0x63
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)

    mul = {
        c: np.array([gf_mul(a, c) for a in range(256)], dtype=np.uint8)
        for c in (2, 3, 9, 11, 13, 14)
    }
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _generate_tables()

# flat-index permutations for a 16-byte block in FIPS input order
# (byte i -> state[r=i%4][c=i//4]); ShiftRows moves row r left by r columns
_SHIFT_ROWS = np.array(
    [((i // 4 + i % 4) % 4) * 4 + i % 4 for i in range(16)], dtype=np.int64
)
_INV_SHIFT_ROWS = np.array(
    [((i // 4 - i % 4) % 4) * 4 + i % 4 for i in range(16)], dtype=np.int64
)


def expand_key(key: bytes) -> np.ndarray:
    """AES key schedule -> (Nr+1, 16) uint8 round keys (FIPS-197 §5.2).
    Nk = 4/6/8 words (AES-128/192/256, Nr = Nk+6); the Nk>6 schedule adds
    the extra SubWord at i % Nk == 4."""
    if len(key) not in (16, 24, 32):
        raise ValueError(f"AES needs a 16/24/32-byte key, got {len(key)}")
    nk = len(key) // 4
    nr = nk + 6
    rcon = 1
    words = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = (rcon << 1) ^ (0x11B if rcon & 0x80 else 0)
            rcon &= 0xFF
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    flat = [b for w in words for b in w]
    return np.array(flat, dtype=np.uint8).reshape(nr + 1, 16)


def _mix_columns(state: np.ndarray) -> np.ndarray:
    s = state.reshape(-1, 4, 4)  # (n, column, row)
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    m2, m3 = _MUL[2], _MUL[3]
    out = np.empty_like(s)
    out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
    out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(state: np.ndarray) -> np.ndarray:
    s = state.reshape(-1, 4, 4)
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = np.empty_like(s)
    out[:, :, 0] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
    out[:, :, 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
    out[:, :, 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
    out[:, :, 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    return out.reshape(-1, 16)


def encrypt_blocks(round_keys: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Forward cipher over (n, 16) uint8 blocks (FIPS-197 §5.1)."""
    nr = len(round_keys) - 1
    state = blocks ^ round_keys[0]
    for rnd in range(1, nr):
        state = _SBOX[state][:, _SHIFT_ROWS]
        state = _mix_columns(state) ^ round_keys[rnd]
    return _SBOX[state][:, _SHIFT_ROWS] ^ round_keys[nr]


def decrypt_blocks(round_keys: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Inverse cipher over (n, 16) uint8 blocks (FIPS-197 §5.3)."""
    nr = len(round_keys) - 1
    state = blocks ^ round_keys[nr]
    for rnd in range(nr - 1, 0, -1):
        state = _INV_SBOX[state[:, _INV_SHIFT_ROWS]] ^ round_keys[rnd]
        state = _inv_mix_columns(state)
    return _INV_SBOX[state[:, _INV_SHIFT_ROWS]] ^ round_keys[0]


def cbc_decrypt(key: bytes, payload: bytes) -> bytes:
    """PDF /AESV2 stream layout: 16-byte IV prefix + CBC ciphertext with
    PKCS#7 padding (ISO 32000-1 §7.6.2). All blocks decrypt in ONE
    vectorized pass; the CBC chain is a shifted XOR afterwards."""
    if len(payload) < 32 or len(payload) % 16:
        raise ValueError(f"AES-CBC payload length invalid: {len(payload)}")
    buf = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 16)
    iv, ct = buf[:1], buf[1:]
    plain = decrypt_blocks(expand_key(key), ct)
    plain ^= np.concatenate([iv, ct[:-1]])
    raw = plain.tobytes()
    pad = raw[-1]
    if not 1 <= pad <= 16 or raw[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC: bad PKCS#7 padding (wrong key?)")
    return raw[:-pad]


def _generate_ttables():
    """Classic 32-bit T-table formulation of the forward round (one lookup
    + XOR per state byte) — derived from the same generated S-box/multiply
    tables. CBC encryption is sequential per stream, so the single-block
    path must be cheap in pure Python; numpy per-block overhead is ~100×."""
    m2, m3 = _MUL[2], _MUL[3]
    te = [[0] * 256 for _ in range(4)]
    for a in range(256):
        s = int(_SBOX[a])
        word = (int(m2[s]) << 24) | (s << 16) | (s << 8) | int(m3[s])
        te[0][a] = word
        te[1][a] = ((word >> 8) | (word << 24)) & 0xFFFFFFFF
        te[2][a] = ((word >> 16) | (word << 16)) & 0xFFFFFFFF
        te[3][a] = ((word >> 24) | (word << 8)) & 0xFFFFFFFF
    return te


_TE = _generate_ttables()
_SBOX_I = [int(b) for b in _SBOX]


def _round_key_words(round_keys: np.ndarray) -> list[int]:
    flat = round_keys.reshape(-1)
    return [
        int.from_bytes(flat[i : i + 4].tobytes(), "big")
        for i in range(0, flat.size, 4)
    ]


def _encrypt_block_scalar(rk: list[int], block: bytes) -> bytes:
    te0, te1, te2, te3 = _TE
    sb = _SBOX_I
    n_mid = len(rk) // 4 - 2  # 9/11/13 T-table rounds for AES-128/192/256
    s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    k = 4
    for _ in range(n_mid):
        t0 = te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF] ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ rk[k]
        t1 = te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF] ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ rk[k + 1]
        t2 = te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF] ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ rk[k + 2]
        t3 = te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF] ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16) | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ rk[k]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16) | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ rk[k + 1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16) | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ rk[k + 2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16) | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ rk[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """IV-prefixed CBC with PKCS#7 padding — the fixture-writer direction.
    Sequential across blocks by CBC's definition (T-table scalar core)."""
    pad = 16 - len(data) % 16
    raw = data + bytes([pad]) * pad
    rk = _round_key_words(expand_key(key))
    out = [iv]
    prev = iv
    for i in range(0, len(raw), 16):
        block = bytes(a ^ b for a, b in zip(raw[i : i + 16], prev))
        prev = _encrypt_block_scalar(rk, block)
        out.append(prev)
    return b"".join(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC, no padding, no IV prefix — the ISO 32000-2 Algorithm 2.B
    hash step and the /UE//OE file-key wrapping (data must be 16-aligned)."""
    if len(data) % 16:
        raise ValueError(f"CBC-nopad needs 16-aligned data, got {len(data)}")
    rk = _round_key_words(expand_key(key))
    out = []
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block_scalar(rk, block)
        out.append(prev)
    return b"".join(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, payload: bytes) -> bytes:
    """Raw CBC decrypt, explicit IV, no padding — /UE//OE unwrapping
    (vectorized like cbc_decrypt)."""
    if not payload or len(payload) % 16:
        raise ValueError(f"CBC-nopad payload length invalid: {len(payload)}")
    ct = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 16)
    plain = decrypt_blocks(expand_key(key), ct)
    ivrow = np.frombuffer(iv, dtype=np.uint8).reshape(1, 16)
    plain ^= np.concatenate([ivrow, ct[:-1]])
    return plain.tobytes()


def ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB — the /Perms entry of the V5 standard handler."""
    return _encrypt_block_scalar(_round_key_words(expand_key(key)), block)
