"""FMF: flat metadata format (``name<TAB>key:T:value...`` rows).

Functional twin of the reference metadata store (reference fmf.c): an in-RAM
table with interned keys and string values plus row-vs-expression testing
(`fmf_test`), and a streaming variant that tokenizes and tests each line
without materializing the table (`fms_read`).  The quirks that affect query
results are preserved: ``_ROW_`` is only bound when a row has metadata (in
the in-RAM path), real-typed values bind through the integer setter in the
in-RAM path (truncation) but through the real setter in the streaming path,
and flag-typed keys bind nothing (fmf.c:140-156, 185-227).
"""

from __future__ import annotations

import gzip

from ..core import kexpr

FMF_FLAG = 0
FMF_INT = 1
FMF_REAL = 2
FMF_STR = 3


def _open_text(fn: str):
    f = open(fn, "rb")
    if f.read(2) == b"\x1f\x8b":
        f.close()
        return gzip.open(fn, "rt", encoding="latin-1")
    f.seek(0)
    import io
    return io.TextIOWrapper(f, encoding="latin-1")


def _parse_meta(token: str):
    """Split 'key[:T:value]' -> (key, type, value-str)."""
    c = token.find(":")
    if c < 0:
        return token, FMF_FLAG, None
    key = token[:c]
    rest_len = len(token) - c
    if rest_len >= 3:
        tc = token[c + 1]
        val = token[c + 3:]
        if tc == "i":
            return key, FMF_INT, val
        if tc == "f":
            return key, FMF_REAL, val
        return key, FMF_STR, val
    return key, FMF_FLAG, None


def _strtol(s: str) -> int:
    """C strtol(.., base=0): optional sign, then decimal/hex/octal prefix."""
    i, n = 0, len(s)
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    if s[i:i + 2].lower() == "0x":
        j = i + 2
        while j < n and s[j].lower() in "0123456789abcdef":
            j += 1
        return sign * int(s[i + 2:j], 16) if j > i + 2 else 0
    j = i
    while j < n and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    if s[i] == "0":
        return sign * int(s[i:j], 8)
    return sign * int(s[i:j])


def _strtod(s: str) -> float:
    import re
    m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    return float(m.group(0)) if m else 0.0


class Fmf:
    """In-RAM FMF table (fmf_t)."""

    def __init__(self):
        self.keys: list[str] = []
        self._key_id: dict[str, int] = {}
        self.vals: list[str] = []
        self._val_id: dict[str, int] = {}
        self.rows: list[tuple[str, list]] = []  # (name, [(key_id, type, value)])

    @property
    def n_rows(self) -> int:
        return len(self.rows)

    @classmethod
    def read(cls, fn: str) -> "Fmf":
        f = cls()
        with _open_text(fn) as fp:
            for line in fp:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("\t")
                metas = []
                for token in parts[1:]:
                    key, t, val = _parse_meta(token)
                    kid = f._key_id.get(key)
                    if kid is None:
                        kid = len(f.keys)
                        f._key_id[key] = kid
                        f.keys.append(key)
                    if t == FMF_INT:
                        metas.append((kid, t, _strtol(val)))
                    elif t == FMF_REAL:
                        metas.append((kid, t, _strtod(val)))
                    elif t == FMF_STR:
                        vid = f._val_id.get(val)
                        if vid is None:
                            vid = len(f.vals)
                            f._val_id[val] = vid
                            f.vals.append(val)
                        metas.append((kid, t, vid))
                    else:
                        metas.append((kid, t, 0))
                f.rows.append((parts[0], metas))
        return f

    def row_name(self, r: int) -> str:
        return self.rows[r][0]

    def get_meta(self, r: int, key: str):
        """(type, value) of the LAST meta with this key, or None."""
        kid = self._key_id.get(key)
        if kid is None:
            return None
        out = None
        for mkid, t, v in self.rows[r][1]:
            if mkid == kid:
                out = (t, self.vals[v] if t == FMF_STR else v)
        return out

    def test(self, r: int, ke: kexpr.Kexpr) -> bool:
        """fmf_test semantics (fmf.c:140-156)."""
        if r >= len(self.rows):
            return False
        name, metas = self.rows[r]
        ke.unset()
        for kid, t, v in metas:
            ke.set_str("_ROW_", name)
            if t == FMF_STR:
                ke.set_str(self.keys[kid], self.vals[v])
            elif t == FMF_INT:
                ke.set_int(self.keys[kid], v)
            elif t == FMF_REAL:
                ke.set_int(self.keys[kid], int(v))  # reference truncates here
        err, i = ke.eval_int()
        return not (err or not i)

    def write_row(self, r: int) -> str:
        """Round-trip a row back to text (fmf_write)."""
        name, metas = self.rows[r]
        parts = [name]
        for kid, t, v in metas:
            if t == FMF_FLAG:
                parts.append(self.keys[kid])
            elif t == FMF_INT:
                parts.append(f"{self.keys[kid]}:i:{v}")
            elif t == FMF_REAL:
                parts.append(f"{self.keys[kid]}:f:{'%g' % v}")
            else:
                parts.append(f"{self.keys[kid]}:Z:{self.vals[v]}")
        return "\t".join(parts)


class FmfStream:
    """Streaming FMF scan (fms_t): test each row against an expression."""

    def __init__(self, fn: str):
        self._fp = _open_text(fn)

    def close(self):
        self._fp.close()

    def read(self, ke: kexpr.Kexpr | None, name_only: bool) -> str | None:
        """Next passing row (name or whole line); None at EOF (fms_read)."""
        for line in self._fp:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            if ke is not None:
                ke.unset()
                ke.set_str("_ROW_", parts[0])
                for token in parts[1:]:
                    key, t, val = _parse_meta(token)
                    if t == FMF_INT:
                        ke.set_int(key, _strtol(val))
                    elif t == FMF_REAL:
                        ke.set_real(key, _strtod(val))
                    elif t == FMF_STR:
                        ke.set_str(key, val)
                err, i = ke.eval_int()
                if err or not i:
                    continue
            return parts[0] if name_only else line
        return None

    def __iter__(self):
        return self

    def __next__(self):
        raise TypeError("use read()")
