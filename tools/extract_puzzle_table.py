"""Extract the epoch-puzzle weighted instruction table from the reference
(ledger/puzzle/epoch/src/synthesis/helpers/instruction_set.rs) into JSON.

Output entry shape:
  {"sequence": [{"instruction": "AddWrapped",
                 "operands": [{"kind": "Register", "type": "U128"} |
                              {"kind": "Literal", "text": "1u8"} |
                              {"kind": "Ephemeral"|"Input"|"RegisterOffset",
                               "type": T, "index": k}],
                 "destinations": [{"kind": "Register"|"Ephemeral",
                                   "type": T, "index": k|None}]}],
   "weight": 512}
"""
import json
import re
import sys

SRC = "/root/reference/ledger/puzzle/epoch/src/synthesis/helpers/instruction_set.rs"
OUT = "snarkvm_tpu/synthesizer/resources/puzzle_instruction_set.json"

CONSTS = {
    "DEFAULT": 512, "DEFAULT_BOOLEAN": 4, "DEFAULT_U8": 4, "DEFAULT_U16": 256,
    "DEFAULT_U32": 512, "DEFAULT_U64": 512, "DEFAULT_U128": 512,
    "DEFAULT_I8": 4, "DEFAULT_I16": 256, "DEFAULT_I32": 512,
    "DEFAULT_I64": 512, "DEFAULT_I128": 512,
    "NUM_CAST": 200, "NUM_POWER": 20,
    "VERY_LOW": 4, "LOW": 40, "MEDIUM_LOW": 128,
    "DIV_DIVIDER": 128, "U128_DIVIDER": 512,
}


def balanced(text, i, open_ch="(", close_ch=")"):
    """text[i] == open_ch; return (contents, index_after_close)."""
    assert text[i] == open_ch, text[i : i + 20]
    depth = 0
    for j in range(i, len(text)):
        if text[j] == open_ch:
            depth += 1
        elif text[j] == close_ch:
            depth -= 1
            if depth == 0:
                return text[i + 1 : j], j + 1
    raise ValueError("unbalanced")


def parse_weight(expr):
    expr = expr.strip().rstrip(",").strip()

    def atom(tok):
        tok = tok.strip()
        return CONSTS[tok] if tok in CONSTS else int(tok)

    # grammar in the table: products then integer divisions, left to right
    val = None
    for div_part in expr.split("/"):
        prod = 1
        for f in div_part.split("*"):
            prod *= atom(f)
        val = prod if val is None else val // prod
    return val


def parse_literal(arg):
    """arg like 'Literal::I8(I8::new(1))' or 'Literal::Field(Field::zero())'."""
    m = re.match(r"Literal::(\w+)\((.*)\)$", arg.strip(), re.S)
    ty, inner = m.group(1), m.group(2).strip()
    if inner.endswith("::zero()"):
        value = "0"
    elif inner.endswith("::one()"):
        value = "1"
    else:
        mv = re.match(r"\w+::new\((-?\d+)\)", inner)
        value = mv.group(1)
    return {"kind": "Literal", "text": f"{value}{ty.lower()}"}


def parse_operand(text):
    text = text.strip()
    m = re.match(r"Operand::(\w+)\(", text)
    kind = m.group(1)
    arg, _ = balanced(text, m.end() - 1)
    if kind == "Literal":
        return parse_literal(arg)
    if kind == "Register":
        ty = arg.split("::")[-1]
        return {"kind": "Register", "type": ty}
    # Ephemeral / Input / RegisterOffset: (LiteralType::X, k)
    ty_part, idx_part = arg.rsplit(",", 1)
    return {"kind": kind, "type": ty_part.split("::")[-1].strip(),
            "index": int(idx_part.strip())}


def parse_destination(text):
    text = text.strip()
    m = re.match(r"Destination::(\w+)\(", text)
    kind = m.group(1)
    arg, _ = balanced(text, m.end() - 1)
    if kind == "Register":
        return {"kind": "Register", "type": arg.split("::")[-1].strip(), "index": None}
    ty_part, idx_part = arg.rsplit(",", 1)
    return {"kind": kind, "type": ty_part.split("::")[-1].strip(),
            "index": int(idx_part.strip())}


def split_top(text, sep=","):
    """Split at top-level commas (paren/bracket aware)."""
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur))
    return parts


def parse_instruction(text):
    """(Instruction::X, vec![ops...], vec![dests...])"""
    m = re.match(r"\s*Instruction::(\w+)\s*,", text)
    name = m.group(1)
    rest = text[m.end():]
    vecs = []
    i = 0
    for _ in range(2):
        j = rest.index("vec!", i)
        contents, i = balanced(rest, j + 4, "[", "]")
        vecs.append(contents)
    ops = [parse_operand(p) for p in split_top(vecs[0]) if p.strip()]
    dests = [parse_destination(p) for p in split_top(vecs[1]) if p.strip()]
    return {"instruction": name, "operands": ops, "destinations": dests}


def main():
    src = open(SRC).read()
    start = src.index("pub fn instruction_set")
    body_start = src.index("vec![", start)
    table, _ = balanced(src, body_start + 4, "[", "]")

    entries = []
    i = 0
    while True:
        j = table.find("(vec![", i)
        if j < 0:
            break
        entry_text, i = balanced(table, j)
        # entry_text = "vec![ ... ], WEIGHT"
        seq_text, k = balanced(entry_text, entry_text.index("vec![") + 4, "[", "]")
        weight = parse_weight(entry_text[k:].lstrip().lstrip(","))
        seq = []
        m = 0
        while True:
            t = seq_text.find("(Instruction::", m)
            if t < 0:
                break
            inst_text, m = balanced(seq_text, t)
            seq.append(parse_instruction(inst_text))
        entries.append({"sequence": seq, "weight": weight})

    multi = sum(1 for e in entries if len(e["sequence"]) > 1)
    total = sum(len(e["sequence"]) for e in entries)
    nonzero = sum(1 for e in entries if e["weight"] > 0)
    total_w = sum(e["weight"] for e in entries)
    lits = sum(1 for e in entries for s in e["sequence"]
               for o in s["operands"] if o["kind"] == "Literal")
    print(f"entries: {len(entries)} multi: {multi} total instructions: {total} "
          f"nonzero: {nonzero} total weight: {total_w} literal operands: {lits}")
    json.dump(entries, open(OUT, "w"))


if __name__ == "__main__":
    main()
