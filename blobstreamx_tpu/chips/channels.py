"""Bus channel ids shared by all chips and the circuit CPU table."""

WIRE = 1        # (wire_index, value) — CPU dataflow routing
RANGE8 = 2      # (value) — byte range check against the bytes chip
SHA_W = 3       # (instance, block, slot, word) — message words to the SHA chip
SHA_OUT_A = 4   # (instance, j, word) — digest words 0..3 from the SHA chip
SHA_OUT_E = 5   # (instance, j, word) — digest words 4..7 from the SHA chip
SHA_CHAIN_A = 6 # (instance, block, j, word) — chip-internal chaining (a side)
SHA_CHAIN_E = 7 # (instance, block, j, word) — chip-internal chaining (e side)
PUBLIC = 8      # (position, value) — public inputs/outputs
