"""Reference-compatible byte formats (FromBytes/ToBytes parity).

snarkVM serializes every protocol object with a hand-rolled
little-endian `ToBytes`/`FromBytes` layer plus arkworks-style
`CanonicalSerialize` for SNARK objects. This package implements the
same wire formats so the framework can consume real Aleo artifacts
(the mainnet genesis block, credits.aleo verifying keys, the shipped
.usrs SRS shards) and emit byte-identical encodings of its own
objects.

Modules:
  io          -- Reader/Writer primitives (ints, fields, varints)
  canonical   -- CanonicalSerialize analogs: compressed curve points
  program_io  -- Aleo program bytecode (.avm) <-> text source
  varuna_io   -- Varuna Proof / CircuitVerifyingKey / Certificate
  block_io    -- the full Block object graph (ledger/block/src/*)
"""
