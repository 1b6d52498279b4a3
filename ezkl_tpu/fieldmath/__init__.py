from . import limbs, spec
from .spec import bn254_fq, bn254_fr, FieldSpec

__all__ = ["limbs", "spec", "bn254_fq", "bn254_fr", "FieldSpec"]
