"""PDF standard security handler (encrypted PDFs), pure stdlib.

Reference behavior: ``PdfBackendOptions(password=...)`` decrypts via
pypdfium2/qpdf (``tests/test_pdf_password.py`` - conversion of the
AESV2-encrypted fixture must SUCCEED). Web crawls are full of PDFs
encrypted with an EMPTY user password (owner-restricted), so the
engine attempts ``password=""`` by default.

Implements the Standard security handler algorithms from the PDF spec:
- R2-R4 key derivation (MD5 padding rounds), per-object RC4/AES keys;
- R5/R6 (AES-256) SHA-256 family key derivation;
- RC4 and AES-128/256-CBC decryption in pure Python (stream sizes are
  document-scale; the hot path at 100 TB is unencrypted crawl PDFs, so
  clarity beats cycles here).
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------------- AES

_SBOX = [
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b,
    0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0,
    0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7, 0xfd, 0x93, 0x26,
    0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2,
    0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0,
    0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed,
    0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f,
    0x50, 0x3c, 0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5,
    0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14,
    0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c,
    0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79, 0xe7, 0xc8, 0x37, 0x6d,
    0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f,
    0x4b, 0xbd, 0x8b, 0x8a, 0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e,
    0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11,
    0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f,
    0xb0, 0x54, 0xbb, 0x16]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a = (a ^ 0x1B) & 0xFF
    return a


_MUL = [[0] * 256 for _ in range(16)]
for _c in (9, 11, 13, 14):
    for _a in range(256):
        r, b, x = 0, _c, _a
        while b:
            if b & 1:
                r ^= x
            x = _xtime(x)
            b >>= 1
        _MUL[_c][_a] = r


def _expand_key(key: bytes) -> list:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return [[b for c in range(4) for b in w[4 * r + c]]
            for r in range(nr + 1)]


def _aes_decrypt_block(block: bytes, round_keys: list) -> bytes:
    nr = len(round_keys) - 1
    s = [b ^ k for b, k in zip(block, round_keys[nr])]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows
        s = [s[0], s[13], s[10], s[7], s[4], s[1], s[14], s[11],
             s[8], s[5], s[2], s[15], s[12], s[9], s[6], s[3]]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
        # InvMixColumns
        m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
        out = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c:4 * c + 4]
            out[4 * c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            out[4 * c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            out[4 * c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            out[4 * c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = out
    s = [s[0], s[13], s[10], s[7], s[4], s[1], s[14], s[11],
         s[8], s[5], s[2], s[15], s[12], s[9], s[6], s[3]]
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, round_keys[0])]
    return bytes(s)


def _aes_encrypt_block(block: bytes, round_keys: list) -> bytes:
    nr = len(round_keys) - 1
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        s = [s[0], s[5], s[10], s[15], s[4], s[9], s[14], s[3],
             s[8], s[13], s[2], s[7], s[12], s[1], s[6], s[11]]
        out = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c:4 * c + 4]
            out[4 * c] = _xtime(a0) ^ (_xtime(a1) ^ a1) ^ a2 ^ a3
            out[4 * c + 1] = a0 ^ _xtime(a1) ^ (_xtime(a2) ^ a2) ^ a3
            out[4 * c + 2] = a0 ^ a1 ^ _xtime(a2) ^ (_xtime(a3) ^ a3)
            out[4 * c + 3] = (_xtime(a0) ^ a0) ^ a1 ^ a2 ^ _xtime(a3)
        s = [b ^ k for b, k in zip(out, round_keys[rnd])]
    s = [_SBOX[b] for b in s]
    s = [s[0], s[5], s[10], s[15], s[4], s[9], s[14], s[3],
         s[8], s[13], s[2], s[7], s[12], s[1], s[6], s[11]]
    return bytes(b ^ k for b, k in zip(s, round_keys[nr]))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2/V3 payload: first 16 bytes are the IV; PKCS#7 padding."""
    if len(data) < 32:
        return b""
    rk = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    body = data[16:len(data) - (len(data) - 16) % 16 + 16] \
        if (len(data) - 16) % 16 == 0 else data[16:16 + ((len(data) - 16) // 16) * 16]
    for off in range(0, len(body), 16):
        blk = body[off:off + 16]
        dec = _aes_decrypt_block(blk, rk)
        out.extend(x ^ y for x, y in zip(dec, prev))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def aes_cbc_no_padding_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data) - len(data) % 16, 16):
        blk = data[off:off + 16]
        dec = _aes_decrypt_block(blk, rk)
        out.extend(x ^ y for x, y in zip(dec, prev))
        prev = blk
    return bytes(out)


# ------------------------------------------------- standard handler

class StandardSecurityHandler:
    """/Filter /Standard: derives the file key from the password and
    decrypts strings/streams with per-object keys (R2-R4) or the file
    key directly (R5-R6 AES-256)."""

    def __init__(self, enc: dict, file_id: bytes, password: str = ""):
        self.r = int(enc.get("R", 2))
        self.v = int(enc.get("V", 1))
        self.length = int(enc.get("Length", 40)) // 8
        self.o = _as_bytes(enc.get("O", b""))
        self.u = _as_bytes(enc.get("U", b""))
        self.p = int(enc.get("P", -1)) & 0xFFFFFFFF
        self.encrypt_metadata = bool(enc.get("EncryptMetadata", True))
        self.file_id = file_id
        # crypt-filter methods: V4/V5 name the StmF/StrF filters in /CF;
        # pre-V4 has no filter machinery (RC4 per-object keys for both).
        # StrF defaults to Identity, so a V4 doc can encrypt streams
        # while leaving strings in the clear.
        self.cfm = self._filter_method(enc, "StmF")
        self.strf_cfm = self._filter_method(enc, "StrF")
        pwd = password.encode("latin-1", errors="replace")
        if self.r >= 5:
            valid = hashlib.sha256(pwd + self.u[32:40]).digest() \
                if self.r == 5 else self._hash_r6(pwd, self.u[32:40], b"")
            if valid != self.u[:32]:
                raise ValueError("wrong PDF password")
            self.key = self._key_r6(pwd, enc)
        else:
            self.key = self._key_r234(pwd)
            if not self._check_user_password():
                raise ValueError("wrong PDF password")

    def _filter_method(self, enc: dict, which: str) -> str:
        if self.v < 4:
            return "V2"
        name = str(enc.get(which, "Identity"))
        if name == "Identity":
            return "Identity"
        cf = enc.get("CF")
        if isinstance(cf, dict) and name in cf and isinstance(cf[name], dict):
            return str(cf[name].get("CFM", "V2"))
        return "AESV3" if self.v >= 5 else "V2"

    def _check_user_password(self) -> bool:
        """Algorithm 4/5: recompute U from the derived key."""
        if self.r == 2:
            return rc4(self.key, _PAD) == self.u[:32]
        h = hashlib.md5(_PAD + self.file_id).digest()
        x = rc4(self.key, h)
        for i in range(1, 20):
            step_key = bytes(b ^ i for b in self.key)
            x = rc4(step_key, x)
        return x[:16] == self.u[:16]

    def _key_r234(self, pwd: bytes) -> bytes:
        padded = (pwd + _PAD)[:32]
        h = hashlib.md5()
        h.update(padded)
        h.update(self.o[:32])
        h.update(struct.pack("<I", self.p))
        h.update(self.file_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = self.length if self.r >= 3 else 5
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _key_r6(self, pwd: bytes, enc: dict) -> bytes:
        # Algorithm 2.A: the intermediate key unwraps /UE into the file
        # key.  R5 (deprecated AES-256) uses plain SHA-256(pwd+key_salt);
        # R6 runs the 2.B iterated hash.
        key_salt = self.u[40:48]
        if self.r == 5:
            inter = hashlib.sha256(pwd + key_salt).digest()
        else:
            inter = self._hash_r6(pwd, key_salt, b"")
        ue = _as_bytes(enc.get("UE", b""))
        return aes_cbc_no_padding_decrypt(inter, b"\x00" * 16, ue)

    @staticmethod
    def _hash_r6(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
        k = hashlib.sha256(pwd + salt + udata).digest()
        i = 0
        while True:
            k1 = (pwd + k + udata) * 64
            rk = _expand_key(k[:16])
            e = bytearray()
            prev = k[16:32]
            for off in range(0, len(k1) - len(k1) % 16, 16):
                blk = bytes(x ^ y for x, y in zip(k1[off:off + 16], prev))
                prev = _aes_encrypt_block(blk, rk)
                e.extend(prev)
            # Algorithm 2.B: select the digest by the first 16 bytes of E
            # taken as a big-endian integer mod 3 (== byte-sum mod 3,
            # since 256 = 1 mod 3)
            mod = sum(e[:16]) % 3 if e else 0
            if mod == 0:
                k = hashlib.sha256(bytes(e)).digest()
            elif mod == 1:
                k = hashlib.sha384(bytes(e)).digest()
            else:
                k = hashlib.sha512(bytes(e)).digest()
            i += 1
            if i >= 64 and e[-1] <= i - 32:
                break
        return k[:32]

    def object_key(self, num: int, gen: int, cfm: str) -> bytes:
        if self.r >= 5:
            return self.key
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if cfm == "AESV2":
            h.update(b"sAlT")
        return h.digest()[:min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int,
                string: bool = False) -> bytes:
        """Decrypt a stream payload, or a string when ``string=True``
        (strings route through /StrF - Identity leaves them as-is)."""
        if not data:
            return data
        cfm = self.strf_cfm if string else self.cfm
        if cfm == "Identity":
            return data
        key = self.object_key(num, gen, cfm)
        if cfm in ("AESV2", "AESV3"):
            return aes_cbc_decrypt(key, data)
        return rc4(key, data)


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", errors="replace")
    return b""
