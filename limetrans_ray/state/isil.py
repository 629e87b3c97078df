"""hbz network ISIL registry + Alma job-variable setup.

The reference resolves every Alma job's fix variables from a built-in
ISIL table (Limetrans.java:55-150 ``enum Isil``: ISIL → Alma
institution code + member code) and a variable-initialisation step
(Limetrans.java:286-410 ``initializeVars``/``initializeAlma``) that the
``alma.fix`` rule corpus assumes: ``$[isil] $[sigel] $[member]
$[network] $[institution-code] $[catalogid] $[external-maps]
$[id-suffix] $[regexp.*] $[deletion-*]``. :func:`alma_job_vars`
re-expresses that contract so a genuine rule file compiles against the
same variable environment a reference job would provide.

The table itself is public registry data (German library ISILs and
their Alma codes), not code.
"""

from __future__ import annotations

import re

# ISIL → (alma institution code, alma member code) — Limetrans.java
# enum Isil, one row per hbz network member.
ISIL_TABLE: dict[str, tuple[str, str]] = {
    "DE-5": ("6467", "49HBZ_ULB"),
    "DE-6": ("6449", "49HBZ_ULM"),
    "DE-38": ("6476", "49HBZ_UBK"),
    "DE-38M": ("6472", "49HBZ_ZBM"),
    "DE-51": ("6480", "49HBZ_DET"),
    "DE-61": ("6443", "49HBZ_DUE"),
    "DE-82": ("6448", "49HBZ_UBA"),
    "DE-107": ("8973", "49HBZ_LBZ"),
    "DE-121": ("8972", "49HBZ_WBT"),
    "DE-290": ("6445", "49HBZ_UBD"),
    "DE-294": ("6471", "49HBZ_UBO"),
    "DE-361": ("6442", "49HBZ_BIE"),
    "DE-385": ("6470", "49HBZ_UBT"),
    "DE-386": ("7476", "49HBZ_RTU"),
    "DE-465": ("6446", "49HBZ_UDE"),
    "DE-466": ("6463", "49HBZ_PAD"),
    "DE-467": ("6462", "49HBZ_SIE"),
    "DE-468": ("6447", "49HBZ_WUP"),
    "DE-583": ("6482", "49HBZ_HHL"),
    "DE-605": ("6441", "49HBZ_NETWORK"),
    "DE-708": ("6464", "49HBZ_FUH"),
    "DE-743": ("6468", "49HBZ_OWL"),
    "DE-829": ("8056", "49HBZ_HSN"),
    "DE-832": ("6477", "49HBZ_THK"),
    "DE-836": ("6485", "49HBZ_FHM"),
    "DE-956": ("6483", "49HBZ_EVH"),
    "DE-987": ("8987", "49HBZ_HSK"),
    "DE-1010": ("6456", "49HBZ_WHS"),
    "DE-1032": ("6474", "49HBZ_KHO"),
    "DE-1044": ("6452", "49HBZ_BRS"),
    "DE-1082": ("8980", "49HBZ_HKL"),
    "DE-1116": ("8976", "49HBZ_HSL"),
    "DE-1117": ("8977", "49HBZ_HSW"),
    "DE-1140": ("6484", "49HBZ_RFH"),
    "DE-1156": ("6459", "49HBZ_FUK"),
    "DE-1383": ("6479", "49HBZ_RHW"),
    "DE-1393": ("6453", "49HBZ_RUW"),
    "DE-1866": ("6481", "49HBZ_HGB"),
    "DE-1972": ("6457", "49HBZ_RSH"),
    "DE-A96": ("6444", "49HBZ_FHA"),
    "DE-B23": ("8975", "49HBZ_DWD"),
    "DE-Bi10": ("6450", "49HBZ_HBI"),
    "DE-Bm1": ("6469", "49HBZ_TGA"),
    "DE-Bm3": ("8974", "49HBZ_BDR"),
    "DE-Bm40": ("6454", "49HBZ_HBO"),
    "DE-Dm13": ("6451", "49HBZ_FDO"),
    "DE-Due18": ("6458", "49HBZ_KAD"),
    "DE-Due62": ("6455", "49HBZ_HSD"),
    "DE-Hag4": ("6461", "49HBZ_FSW"),
    "DE-Kn28": ("8971", "49HBZ_EDK"),
    "DE-Kn38": ("6460", "49HBZ_HMT"),
    "DE-Kn41": ("6478", "49HBZ_ZBS"),
    "DE-Kn185": ("6473", "49HBZ_KHM"),
    "DE-Kob7": ("8057", "49HBZ_UKO"),
    "DE-Tr5": ("8979", "49HBZ_HST"),
}

#: institution code → ISIL reverse map, registered by the reference as
#: the built-in ``institution-code-to-isil`` lookup map
INSTITUTION_CODE_TO_ISIL: dict[str, str] = {
    code: isil for isil, (code, _member) in ISIL_TABLE.items()
}


def alma_job_vars(
    isil: str = "DE-632",
    *,
    catalogid: str = "DE-605",
    external_maps: str = "./maps",
    path: str | None = None,
    deletion: str = "DEL??.a=Y",
    deletion_literal: str | None = None,
    deletion_fallback: bool = True,
    regexp: dict[str, str] | None = None,
    vars: dict[str, str] | None = None,
) -> dict[str, str]:
    """The fix-variable environment an Alma job provides to its rule
    file (Limetrans.java:286-410): ISIL-derived codes, map roots,
    regexp defaults, and the deletion-literal block when configured.

    Unknown ISILs (e.g. the reference's DE-632 placeholder, which has
    no Alma membership) get empty member/institution codes rather than
    an error, so conformance compiles of the rule text never require a
    network membership.
    """
    out: dict[str, str] = {"external-maps": external_maps, "id-suffix": ""}
    out["isil"] = isil
    dash = isil.find("-")
    if dash > 0:
        out["sigel"] = isil[dash + 1:]
    if path is not None:
        out["isil-path"] = f"{path.rstrip('/')}/{isil}"

    inst_code, member = ISIL_TABLE.get(isil, ("", ""))
    net_code, network = ISIL_TABLE.get(catalogid, ("", ""))
    out["catalogid"] = catalogid
    out["member"] = member
    out["network"] = network
    out["institution-code"] = inst_code

    rx = dict(regexp or {})
    out["regexp.description"] = rx.get("description", ".*")
    out["regexp.isil"] = rx.get("isil", re.escape(isil))

    if deletion_literal is not None:
        src, _, val = deletion.partition("=")
        out["deletion-enabled"] = "true"
        out["deletion-fallback"] = str(bool(deletion_fallback)).lower()
        out["deletion-literal"] = deletion_literal
        out["deletion-source"] = src
        out["deletion-value"] = val
    else:
        # Limetrans.java:415-418 — vars are always bound; "-"/"false"
        # placeholders when no deletion literal is configured
        out["deletion-enabled"] = "false"
        out["deletion-fallback"] = "false"
        out["deletion-literal"] = "-"
        out["deletion-source"] = "-"
        out["deletion-value"] = "-"

    out.update(vars or {})
    return out


def alma_builtin_maps() -> dict[str, dict]:
    """Maps the reference job registers in code before the rule file
    runs (Limetrans.java:335-346): the ISIL reverse map plus the
    alias / callnumber / new-timestamp maps (loaded from operator data
    in production; empty here — rule files lookup into them and treat
    misses per their own delete/default policy)."""
    return {
        "institution-code-to-isil": dict(INSTITUTION_CODE_TO_ISIL),
        "alma-alias": {},
        "alma-item-callnumber": {},
        "alma-new-timestamp": {},
    }
