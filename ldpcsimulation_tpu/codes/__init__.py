"""Code representation: alist I/O, constructions, padded-slot `Code` pytree."""

from .alist import Alist, parse_alist, load_alist, dumps_alist, save_alist, from_dense
from .code import Code, build_code, code_from_dense, code_to_alist
from .construct import peg, random_regular, qc_expand, make_regular_code
from .encode import Encoder, gf2_rref, make_encoder, random_codewords

__all__ = [
    "Alist",
    "parse_alist",
    "load_alist",
    "dumps_alist",
    "save_alist",
    "from_dense",
    "Code",
    "build_code",
    "code_from_dense",
    "code_to_alist",
    "peg",
    "random_regular",
    "qc_expand",
    "make_regular_code",
    "Encoder",
    "gf2_rref",
    "make_encoder",
    "random_codewords",
]
