"""Driver-contract query registry — split per domain in round 5.

Import surface is unchanged: ``from seaexplorertools_spark.contract
import QUERIES, ORACLES, table, ts_us_col, ...`` keeps working — this
package merges every module's namespace (including underscore
helpers) exactly as the old flat module exposed them, then orders the
registries by contract/_order.py's canonical list.
"""

from . import _base
from . import refparity, llm_core, relational, llm_scale, llm_quality, llm_train, warehouse, olap_deep, driver_tail, mm_formats, llm_prep
from ._order import CANONICAL_ORDER

_MODULES = (_base, refparity, llm_core, relational, llm_scale, llm_quality, llm_train, warehouse, olap_deep, driver_tail, mm_formats, llm_prep)

# flat-module compatibility: surface every top-level name (underscore
# helpers included — tests import e.g. _MIX_BUDGET) at the package root
for _m in _MODULES:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = _v

llm_train._finalize_pretrain_oracle()

QUERIES = _base.QUERIES
ORACLES = _base.ORACLES


def _apply_canonical_order() -> None:
    for _d in (QUERIES, ORACLES):
        _ordered = {k: _d[k] for k in CANONICAL_ORDER if k in _d}
        _ordered.update({k: v for k, v in _d.items() if k not in _ordered})
        _d.clear()
        _d.update(_ordered)


_apply_canonical_order()
