"""Read CPython 3.7/3.9 ``.pyc`` files on a modern interpreter.

The reference release ships several classifier modules ONLY as bytecode
(``model/classifiers/__pycache__/*.pyc`` with no matching ``.py``):
``TRX_2fcsup_2``, ``TRX_1fc_sup``, ``strm_1fc_sup``, ``cos``, ``CTX`` and
``model/backbone/extract_feature_backbone``.  Their behavior is part of the
reference surface (``model_select.py`` registers them), so parity requires
reading the bytecode.  ``marshal.loads`` cannot unmarshal 3.7/3.9 code
objects on 3.12, and no decompiler is available offline — this module is a
minimal, dependency-free unmarshaller + wordcode disassembler sufficient for
auditing those files.

Usage::

    python tools/pyc_reader.py <file.pyc>            # full disassembly
    python tools/pyc_reader.py <file.pyc> --tree     # code-object tree only

Output is a readable listing: one code object per block (name, arg/varnames,
consts, then ``line: OPNAME resolved-arg`` rows).  Unknown opcodes print as
``<OP_n>`` rather than failing, so a missing table entry degrades loudly but
non-fatally.
"""
from __future__ import annotations

import struct
import sys
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

# --------------------------------------------------------------------------
# pyc header magics (importlib._bootstrap_external MAGIC_NUMBER values)
# --------------------------------------------------------------------------

MAGIC_TO_VERSION = {
    3394: (3, 7),
    3413: (3, 8),
    3425: (3, 9),
}


@dataclass
class Code:
    """Version-independent stand-in for a 3.7/3.9 code object."""

    argcount: int = 0
    posonlyargcount: int = 0
    kwonlyargcount: int = 0
    nlocals: int = 0
    stacksize: int = 0
    flags: int = 0
    code: bytes = b""
    consts: Tuple[Any, ...] = ()
    names: Tuple[str, ...] = ()
    varnames: Tuple[str, ...] = ()
    freevars: Tuple[str, ...] = ()
    cellvars: Tuple[str, ...] = ()
    filename: str = ""
    name: str = ""
    firstlineno: int = 0
    lnotab: bytes = b""
    version: Tuple[int, int] = (3, 7)

    def __repr__(self) -> str:  # keep const listings compact
        return f"<code {self.name!r} @ line {self.firstlineno}>"


# --------------------------------------------------------------------------
# marshal reader (subset: everything the compiler emits for module code)
# --------------------------------------------------------------------------

FLAG_REF = 0x80


class _Reader:
    def __init__(self, data: bytes, version: Tuple[int, int]):
        self.data = data
        self.pos = 0
        self.version = version
        self.refs: List[Any] = []

    # -- primitives ---------------------------------------------------------
    def _bytes(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated marshal stream")
        self.pos += n
        return b

    def _u8(self) -> int:
        return self._bytes(1)[0]

    def _i32(self) -> int:
        return struct.unpack("<i", self._bytes(4))[0]

    def _u32(self) -> int:
        return struct.unpack("<I", self._bytes(4))[0]

    # -- objects ------------------------------------------------------------
    def read(self) -> Any:
        byte = self._u8()
        flag = byte & FLAG_REF
        code = chr(byte & ~FLAG_REF)

        # Objects with FLAG_REF reserve their ref slot BEFORE children parse
        # (CPython r_ref_reserve); recursive structures can't come from
        # source compilation, so patching the slot afterwards is enough.
        idx: Optional[int] = None
        if flag:
            idx = len(self.refs)
            self.refs.append(None)

        obj = self._read_body(code)
        if idx is not None:
            self.refs[idx] = obj
        return obj

    def _read_body(self, t: str) -> Any:
        if t == "0":
            return None  # TYPE_NULL — only valid in dict streams
        if t == "N":
            return None
        if t == "F":
            return False
        if t == "T":
            return True
        if t == "S":
            return StopIteration
        if t == ".":
            return Ellipsis
        if t == "i":
            return self._i32()
        if t == "I":
            return struct.unpack("<q", self._bytes(8))[0]
        if t == "g":
            return struct.unpack("<d", self._bytes(8))[0]
        if t == "y":
            re_, im = struct.unpack("<dd", self._bytes(16))
            return complex(re_, im)
        if t == "l":  # TYPE_LONG: n 15-bit digits
            n = self._i32()
            sign = -1 if n < 0 else 1
            val = 0
            for i in range(abs(n)):
                val |= struct.unpack("<H", self._bytes(2))[0] << (15 * i)
            return sign * val
        if t == "s":  # bytes
            return self._bytes(self._u32())
        if t in "ta":  # interned / ascii (latin-1-safe for audit purposes)
            return self._bytes(self._u32()).decode("ascii", "backslashreplace")
        if t == "A":
            return self._bytes(self._u32()).decode("ascii", "backslashreplace")
        if t in "zZ":  # short ascii (interned)
            return self._bytes(self._u8()).decode("ascii", "backslashreplace")
        if t == "u":
            return self._bytes(self._u32()).decode("utf-8", "backslashreplace")
        if t == "(":
            return tuple(self.read() for _ in range(self._u32()))
        if t == ")":
            return tuple(self.read() for _ in range(self._u8()))
        if t == "[":
            return [self.read() for _ in range(self._u32())]
        if t == "{":
            d = {}
            while True:
                k = self.read_or_null()
                if k is _NULL:
                    break
                d[k] = self.read()
            return d
        if t in "<>":
            return frozenset(self.read() for _ in range(self._u32()))
        if t == "r":
            return self.refs[self._u32()]
        if t == "c":
            return self._read_code()
        raise ValueError(f"unhandled marshal type {t!r} at {self.pos - 1}")

    def read_or_null(self) -> Any:
        byte = self.data[self.pos]
        if chr(byte & ~FLAG_REF) == "0":
            self.pos += 1
            return _NULL
        return self.read()

    def _read_code(self) -> Code:
        c = Code(version=self.version)
        c.argcount = self._i32()
        if self.version >= (3, 8):
            c.posonlyargcount = self._i32()
        c.kwonlyargcount = self._i32()
        c.nlocals = self._i32()
        c.stacksize = self._i32()
        c.flags = self._i32()
        c.code = self.read()
        c.consts = self.read()
        c.names = self.read()
        c.varnames = self.read()
        c.freevars = self.read()
        c.cellvars = self.read()
        c.filename = self.read()
        c.name = self.read()
        c.firstlineno = self._i32()
        c.lnotab = self.read()
        return c


class _Null:
    pass


_NULL = _Null()


def load_pyc(path: str) -> Tuple[Code, Tuple[int, int]]:
    """Parse a 3.7/3.8/3.9 pyc file → (module code object, (major, minor))."""
    data = open(path, "rb").read()
    magic = struct.unpack("<H", data[:2])[0]
    if data[2:4] != b"\r\n":
        raise ValueError(f"{path}: not a pyc (bad magic trailer)")
    try:
        version = MAGIC_TO_VERSION[magic]
    except KeyError:
        raise ValueError(f"{path}: unsupported pyc magic {magic}") from None
    # 3.7+ header: magic(4) + bit_field(4) + mtime-or-hash(8)
    reader = _Reader(data[16:], version)
    return reader.read(), version


# --------------------------------------------------------------------------
# wordcode disassembler
# --------------------------------------------------------------------------

# Names shared by 3.7 and 3.9 (Lib/opcode.py); per-version deltas below.
_OPNAMES_COMMON = {
    1: "POP_TOP", 2: "ROT_TWO", 3: "ROT_THREE", 4: "DUP_TOP",
    5: "DUP_TOP_TWO", 9: "NOP", 10: "UNARY_POSITIVE", 11: "UNARY_NEGATIVE",
    12: "UNARY_NOT", 15: "UNARY_INVERT", 16: "BINARY_MATRIX_MULTIPLY",
    17: "INPLACE_MATRIX_MULTIPLY", 19: "BINARY_POWER", 20: "BINARY_MULTIPLY",
    22: "BINARY_MODULO", 23: "BINARY_ADD", 24: "BINARY_SUBTRACT",
    25: "BINARY_SUBSCR", 26: "BINARY_FLOOR_DIVIDE", 27: "BINARY_TRUE_DIVIDE",
    28: "INPLACE_FLOOR_DIVIDE", 29: "INPLACE_TRUE_DIVIDE",
    50: "GET_AITER", 51: "GET_ANEXT", 52: "BEFORE_ASYNC_WITH",
    55: "INPLACE_ADD", 56: "INPLACE_SUBTRACT", 57: "INPLACE_MULTIPLY",
    59: "INPLACE_MODULO", 60: "STORE_SUBSCR", 61: "DELETE_SUBSCR",
    62: "BINARY_LSHIFT", 63: "BINARY_RSHIFT", 64: "BINARY_AND",
    65: "BINARY_XOR", 66: "BINARY_OR", 67: "INPLACE_POWER", 68: "GET_ITER",
    69: "GET_YIELD_FROM_ITER", 70: "PRINT_EXPR", 71: "LOAD_BUILD_CLASS",
    72: "YIELD_FROM", 73: "GET_AWAITABLE", 75: "INPLACE_LSHIFT",
    76: "INPLACE_RSHIFT", 77: "INPLACE_AND", 78: "INPLACE_XOR",
    79: "INPLACE_OR", 83: "RETURN_VALUE", 84: "IMPORT_STAR",
    85: "SETUP_ANNOTATIONS", 86: "YIELD_VALUE", 87: "POP_BLOCK",
    89: "POP_EXCEPT",
    90: "STORE_NAME", 91: "DELETE_NAME", 92: "UNPACK_SEQUENCE",
    93: "FOR_ITER", 94: "UNPACK_EX", 95: "STORE_ATTR", 96: "DELETE_ATTR",
    97: "STORE_GLOBAL", 98: "DELETE_GLOBAL", 100: "LOAD_CONST",
    101: "LOAD_NAME", 102: "BUILD_TUPLE", 103: "BUILD_LIST",
    104: "BUILD_SET", 105: "BUILD_MAP", 106: "LOAD_ATTR",
    107: "COMPARE_OP", 108: "IMPORT_NAME", 109: "IMPORT_FROM",
    110: "JUMP_FORWARD", 111: "JUMP_IF_FALSE_OR_POP",
    112: "JUMP_IF_TRUE_OR_POP", 113: "JUMP_ABSOLUTE",
    114: "POP_JUMP_IF_FALSE", 115: "POP_JUMP_IF_TRUE", 116: "LOAD_GLOBAL",
    122: "SETUP_FINALLY", 124: "LOAD_FAST", 125: "STORE_FAST",
    126: "DELETE_FAST", 130: "RAISE_VARARGS", 131: "CALL_FUNCTION",
    132: "MAKE_FUNCTION", 133: "BUILD_SLICE", 135: "LOAD_CLOSURE",
    136: "LOAD_DEREF", 137: "STORE_DEREF", 138: "DELETE_DEREF",
    141: "CALL_FUNCTION_KW", 142: "CALL_FUNCTION_EX", 143: "SETUP_WITH",
    144: "EXTENDED_ARG", 145: "LIST_APPEND", 146: "SET_ADD", 147: "MAP_ADD",
    148: "LOAD_CLASSDEREF", 154: "SETUP_ASYNC_WITH", 155: "FORMAT_VALUE",
    156: "BUILD_CONST_KEY_MAP", 157: "BUILD_STRING",
    160: "LOAD_METHOD", 161: "CALL_METHOD",
}

_OPNAMES_37 = {
    **_OPNAMES_COMMON,
    80: "BREAK_LOOP", 81: "WITH_CLEANUP_START", 82: "WITH_CLEANUP_FINISH",
    88: "END_FINALLY", 119: "CONTINUE_LOOP", 120: "SETUP_LOOP",
    121: "SETUP_EXCEPT", 149: "BUILD_LIST_UNPACK", 150: "BUILD_MAP_UNPACK",
    151: "BUILD_MAP_UNPACK_WITH_CALL", 152: "BUILD_TUPLE_UNPACK",
    153: "BUILD_SET_UNPACK", 158: "BUILD_TUPLE_UNPACK_WITH_CALL",
}

_OPNAMES_39 = {
    **_OPNAMES_COMMON,
    48: "RERAISE", 49: "WITH_EXCEPT_START", 74: "LOAD_ASSERTION_ERROR",
    117: "IS_OP", 118: "CONTAINS_OP", 121: "JUMP_IF_NOT_EXC_MATCH",
    162: "LIST_EXTEND", 163: "SET_UPDATE", 164: "DICT_MERGE",
    165: "DICT_UPDATE",
}

HAVE_ARGUMENT = 90
_CMP_OPS = ("<", "<=", "==", "!=", ">", ">=", "in", "not in", "is",
            "is not", "exception match", "BAD")


def _opnames(version: Tuple[int, int]):
    return _OPNAMES_39 if version >= (3, 8) else _OPNAMES_37


def _lines(c: Code):
    """Decode lnotab → {byte offset: line number} (3.7-3.9 format)."""
    out, addr, line = {0: c.firstlineno}, 0, c.firstlineno
    tab = c.lnotab
    for i in range(0, len(tab) - 1, 2):
        addr_incr, line_incr = tab[i], tab[i + 1]
        if line_incr >= 0x80:
            line_incr -= 0x100
        addr += addr_incr
        line += line_incr
        out[addr] = line
    return out


def disassemble(c: Code) -> List[str]:
    names = _opnames(c.version)
    lines = _lines(c)
    rows: List[str] = []
    ext = 0
    for off in range(0, len(c.code), 2):
        op, raw = c.code[off], c.code[off + 1]
        arg = ext << 8 | raw
        ext = arg if op == 144 else 0  # EXTENDED_ARG accumulates
        name = names.get(op, f"<OP_{op}>")
        detail = ""
        if op >= HAVE_ARGUMENT:
            detail = str(arg)
            if name == "LOAD_CONST":
                detail = f"{arg} ({c.consts[arg]!r})"
            elif name in ("LOAD_NAME", "STORE_NAME", "LOAD_GLOBAL",
                          "STORE_GLOBAL", "LOAD_ATTR", "STORE_ATTR",
                          "IMPORT_NAME", "IMPORT_FROM", "LOAD_METHOD",
                          "DELETE_NAME", "DELETE_ATTR"):
                detail = f"{arg} ({c.names[arg]})"
            elif name in ("LOAD_FAST", "STORE_FAST", "DELETE_FAST"):
                detail = f"{arg} ({c.varnames[arg]})"
            elif name in ("LOAD_DEREF", "STORE_DEREF", "LOAD_CLOSURE"):
                cells = tuple(c.cellvars) + tuple(c.freevars)
                detail = f"{arg} ({cells[arg] if arg < len(cells) else '?'})"
            elif name == "COMPARE_OP" and arg < len(_CMP_OPS):
                detail = f"{arg} ({_CMP_OPS[arg]})"
        mark = f"{lines[off]:>5}:" if off in lines else "      "
        rows.append(f"{mark} {off:>4} {name:<28}{detail}")
    return rows


def walk(c: Code):
    """Yield a code object and, recursively, every code const inside it."""
    yield c
    for const in c.consts:
        if isinstance(const, Code):
            yield from walk(const)


def dump(path: str, tree_only: bool = False) -> str:
    mod, version = load_pyc(path)
    out = [f"# {path}  (python {version[0]}.{version[1]})"]
    for c in walk(mod):
        out.append("")
        args = ", ".join(c.varnames[:c.argcount + c.kwonlyargcount])
        out.append(f"== {c.filename}:{c.firstlineno} {c.name}({args}) "
                   f"nlocals={c.nlocals} flags={c.flags:#x}")
        if tree_only:
            continue
        non_code = [k for k in c.consts if not isinstance(k, Code)]
        out.append(f"   names={c.names}")
        out.append(f"   varnames={c.varnames}")
        out.append(f"   consts={non_code!r}")
        out.extend("   " + r for r in disassemble(c))
    return "\n".join(out)


def main(argv: List[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    tree = "--tree" in argv
    for path in [a for a in argv if not a.startswith("-")]:
        print(dump(path, tree_only=tree))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
