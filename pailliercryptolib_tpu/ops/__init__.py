from . import bigint, limbs, montgomery, paillier_ops
