"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship article pipeline over sf0.001 documents.
``queries()`` — every implemented operator/pipeline from SURVEY.md §2:
relational ops with DuckDB oracles (see ``oracle_sql``), plus rows-only
entries for the non-SQL-expressible pipelines (crawl frontier loop, 41-col
article assembly, near-dup sketches).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: sf0.001 documents → pages shape → clean/extract/enrich/
    validate/assemble → 41-column article Dataset."""
    from omni_ray.pipelines.articles import article_pipeline
    from omni_ray.sources.docpages import documents_as_pages

    pages = documents_as_pages("/root/testdata/sf0.001")
    return article_pipeline(pages, gate_articles=False)


def _articles41(sf_dir: str):
    from omni_ray.pipelines.articles import article_pipeline
    from omni_ray.sources.docpages import documents_as_pages

    return article_pipeline(documents_as_pages(sf_dir), gate_articles=False)


def _crawl_schedule(sf_dir: str):
    """Rows-only: full frontier loop (dedup, politeness, priority, fetch) on
    a deterministic synthetic pages universe sized by sf; returns the global
    crawl schedule."""
    from omni_ray.pipelines.crawl import read_schedule_artifacts, run_crawl
    from omni_ray.sources.pages import write_pages_dataset

    n_rows = 400 if "0.001" in sf_dir else (1200 if "0.01" in sf_dir else 4000)
    base = os.path.join(tempfile.gettempdir(), f"omni_ray_crawlq_{n_rows}")
    write_pages_dataset(base, n_rows=n_rows, seed=42, n_buckets=8)
    out_dir = tempfile.mkdtemp(prefix="omni_ray_crawl_out_")
    run_crawl(
        pages_dir=f"{base}/pages",
        seeds_path=f"{base}/seeds.parquet",
        out_dir=out_dir,
        budget_per_host=16,
        n_buckets=8,
        n_seen_shards=2,
    )
    return read_schedule_artifacts(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from omni_ray.pipelines.advisory import ADVISORY_REGISTRY
    from omni_ray.pipelines.assocops import ASSOCOPS_REGISTRY
    from omni_ray.pipelines.auctests import AUCTESTS_REGISTRY
    from omni_ray.pipelines.boundops import BOUNDOPS_REGISTRY
    from omni_ray.pipelines.catops import CATOPS_REGISTRY
    from omni_ray.pipelines.circops import CIRCOPS_REGISTRY
    from omni_ray.pipelines.corpusops import CORPUS_REGISTRY
    from omni_ray.pipelines.engineops import ENGINEOPS_REGISTRY
    from omni_ray.pipelines.estops import ESTOPS_REGISTRY
    from omni_ray.pipelines.estmine import ESTMINE_REGISTRY
    from omni_ray.pipelines.governance import GOVERNANCE_REGISTRY
    from omni_ray.pipelines.graphops import GRAPH_REGISTRY
    from omni_ray.pipelines.growth import GROWTH_REGISTRY
    from omni_ray.pipelines.identops import IDENTOPS_REGISTRY
    from omni_ray.pipelines.increment import INCREMENT_REGISTRY
    from omni_ray.pipelines.dssops import DSSOPS_REGISTRY
    from omni_ray.pipelines.evalops import EVALOPS_REGISTRY
    from omni_ray.pipelines.expops import EXPOPS_REGISTRY
    from omni_ray.pipelines.auditops import AUDITOPS_REGISTRY
    from omni_ray.pipelines.fitops import FITOPS_REGISTRY
    from omni_ray.pipelines.forensics2 import FORENSICS2_REGISTRY
    from omni_ray.pipelines.fpindex import FPINDEX_REGISTRY
    from omni_ray.pipelines.funnelops import FUNNELOPS_REGISTRY
    from omni_ray.pipelines.integrity import INTEGRITY_REGISTRY
    from omni_ray.pipelines.infraops import INFRAOPS_REGISTRY
    from omni_ray.pipelines.lexops import LEXOPS_REGISTRY
    from omni_ray.pipelines.lexstat2 import LEXSTAT2_REGISTRY
    from omni_ray.pipelines.linkops import LINKOPS_REGISTRY
    from omni_ray.pipelines.listops import LISTOPS_REGISTRY
    from omni_ray.pipelines.lmomops import LMOMOPS_REGISTRY
    from omni_ray.pipelines.localops import LOCALOPS_REGISTRY
    from omni_ray.pipelines.mediaops import MEDIAOPS_REGISTRY
    from omni_ray.pipelines.mraops import MRAOPS_REGISTRY
    from omni_ray.pipelines.opsaudit import OPSAUDIT_REGISTRY
    from omni_ray.pipelines.opsmisc import OPSMISC_REGISTRY
    from omni_ray.pipelines.paradoxops import PARADOXOPS_REGISTRY
    from omni_ray.pipelines.planstats import PLANSTATS_REGISTRY
    from omni_ray.pipelines.searchx import SEARCHX_REGISTRY
    from omni_ray.pipelines.mlqueries import ML_REGISTRY, ML_ROWS_ONLY
    from omni_ray.pipelines.queries import REGISTRY
    from omni_ray.pipelines.rankops import RANKOPS_REGISTRY
    from omni_ray.pipelines.remedyops import REMEDYOPS_REGISTRY
    from omni_ray.pipelines.renewops import RENEWOPS_REGISTRY
    from omni_ray.pipelines.relscale import RELSCALE_REGISTRY
    from omni_ray.pipelines.tpchx import TPCHX_REGISTRY
    from omni_ray.pipelines.urltmpl import URLTMPL_REGISTRY
    from omni_ray.pipelines.cuckooaudit import CUCKOOAUDIT_REGISTRY
    from omni_ray.pipelines.styleops import STYLEOPS_REGISTRY
    from omni_ray.pipelines.interop import INTEROP_REGISTRY
    from omni_ray.pipelines.holdout import HOLDOUT_REGISTRY
    from omni_ray.pipelines.linkage import LINKAGE_REGISTRY
    from omni_ray.pipelines.episodeops import EPISODEOPS_REGISTRY
    from omni_ray.pipelines.hashfeat import HASHFEAT_REGISTRY
    from omni_ray.pipelines.mlprep import MLPREP_REGISTRY
    from omni_ray.pipelines.funnelx import FUNNELX_REGISTRY
    from omni_ray.pipelines.robotsops import ROBOTSOPS_REGISTRY
    from omni_ray.pipelines.discoveryops import DISCOVERYOPS_REGISTRY
    from omni_ray.pipelines.htmlqueries import HTMLQUERIES_REGISTRY
    from omni_ray.pipelines.enrichqueries import ENRICHQUERIES_REGISTRY
    from omni_ray.pipelines.kernelmisc import KERNELMISC_REGISTRY
    from omni_ray.pipelines.tpchx2 import TPCHX2_REGISTRY
    from omni_ray.pipelines.trainplan import TRAINPLAN_REGISTRY
    from omni_ray.pipelines.halflife import HALFLIFE_REGISTRY
    from omni_ray.pipelines.contcrawl import CONTCRAWL_REGISTRY
    from omni_ray.pipelines.fetchchain import FETCHCHAIN_REGISTRY
    from omni_ray.pipelines.shardops import SHARDOPS_REGISTRY
    from omni_ray.pipelines.lineageops import LINEAGEOPS_REGISTRY
    from omni_ray.pipelines.cdxops import CDXOPS_REGISTRY
    from omni_ray.pipelines.robotschain import ROBOTSCHAIN_REGISTRY
    from omni_ray.pipelines.revalops import REVALPLAN_REGISTRY
    from omni_ray.pipelines.heavyhitters import HEAVYHITTERS_REGISTRY
    from omni_ray.pipelines.heavychange import HEAVYCHANGE_REGISTRY
    from omni_ray.pipelines.mrlops import MRLOPS_REGISTRY
    from omni_ray.pipelines.trapops import TRAPOPS_REGISTRY
    from omni_ray.pipelines.specops import SPECOPS_REGISTRY
    from omni_ray.pipelines.sketchops import SKETCHOPS_REGISTRY
    from omni_ray.pipelines.spandedup import SPANDEDUP_REGISTRY
    from omni_ray.pipelines.stumpops import STUMPOPS_REGISTRY
    from omni_ray.pipelines.statops import STATOPS_REGISTRY
    from omni_ray.pipelines.allocops import ALLOCOPS_REGISTRY
    from omni_ray.pipelines.richops import RICHOPS_REGISTRY
    from omni_ray.pipelines.rleops import RLEOPS_REGISTRY
    from omni_ray.pipelines.robustops import ROBUSTOPS_REGISTRY
    from omni_ray.pipelines.tsops import TSOPS_REGISTRY
    from omni_ray.pipelines.sysops import SYSOPS_REGISTRY
    from omni_ray.pipelines.tailops import TAILOPS_REGISTRY
    from omni_ray.pipelines.trainprep import TRAINPREP_REGISTRY
    from omni_ray.pipelines.curation import CURATION_REGISTRY
    from omni_ray.pipelines.midops import MIDOPS_REGISTRY
    from omni_ray.pipelines.mixgraph import MIXGRAPH_REGISTRY
    from omni_ray.pipelines.varops import VAROPS_REGISTRY
    from omni_ray.pipelines.vecsketch import VECSKETCH_REGISTRY
    from omni_ray.pipelines.voteops import VOTEOPS_REGISTRY
    from omni_ray.pipelines.webqa import WEBQA_REGISTRY
    from omni_ray.pipelines.webscaleops import WEBSCALE_REGISTRY

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out.update({name: fn for name, (fn, _sql) in SPANDEDUP_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ML_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CORPUS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TRAINPREP_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in GRAPH_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in RELSCALE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in STATOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MEDIAOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ENGINEOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in WEBSCALE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in WEBQA_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CURATION_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MIXGRAPH_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in VECSKETCH_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ASSOCOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in INCREMENT_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ESTMINE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in GOVERNANCE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in PLANSTATS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in SEARCHX_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in GROWTH_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in OPSAUDIT_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in INFRAOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ADVISORY_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in INTEGRITY_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FPINDEX_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in EVALOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in DSSOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TSOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ROBUSTOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ALLOCOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in EXPOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MRAOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in SPECOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in VAROPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LINKOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in SKETCHOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in RANKOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in REMEDYOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FITOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in AUDITOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LEXOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in PARADOXOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in SYSOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ESTOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CIRCOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in STUMPOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in BOUNDOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in RICHOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LEXSTAT2_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in VOTEOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LISTOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in AUCTESTS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MIDOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TAILOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in OPSMISC_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FORENSICS2_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CATOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LMOMOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in RENEWOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TPCHX_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in URLTMPL_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CUCKOOAUDIT_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in STYLEOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in INTEROP_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HOLDOUT_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LINKAGE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in EPISODEOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HASHFEAT_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MLPREP_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FUNNELX_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ROBOTSOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in DISCOVERYOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HTMLQUERIES_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ENRICHQUERIES_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in KERNELMISC_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TPCHX2_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TRAINPLAN_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HALFLIFE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CONTCRAWL_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FETCHCHAIN_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in SHARDOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LINEAGEOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in CDXOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in ROBOTSCHAIN_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in REVALPLAN_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HEAVYHITTERS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in HEAVYCHANGE_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in MRLOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in TRAPOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in IDENTOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in FUNNELOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in LOCALOPS_REGISTRY.items()})
    out.update({name: fn for name, (fn, _sql) in RLEOPS_REGISTRY.items()})
    out.update(ML_ROWS_ONLY)
    out["articles41"] = _articles41
    out["crawl_schedule"] = _crawl_schedule
    return out


def oracle_sql() -> dict[str, str]:
    from omni_ray.pipelines.advisory import ADVISORY_REGISTRY
    from omni_ray.pipelines.assocops import ASSOCOPS_REGISTRY
    from omni_ray.pipelines.auctests import AUCTESTS_REGISTRY
    from omni_ray.pipelines.boundops import BOUNDOPS_REGISTRY
    from omni_ray.pipelines.catops import CATOPS_REGISTRY
    from omni_ray.pipelines.circops import CIRCOPS_REGISTRY
    from omni_ray.pipelines.corpusops import CORPUS_REGISTRY
    from omni_ray.pipelines.engineops import ENGINEOPS_REGISTRY
    from omni_ray.pipelines.estops import ESTOPS_REGISTRY
    from omni_ray.pipelines.estmine import ESTMINE_REGISTRY
    from omni_ray.pipelines.governance import GOVERNANCE_REGISTRY
    from omni_ray.pipelines.graphops import GRAPH_REGISTRY
    from omni_ray.pipelines.growth import GROWTH_REGISTRY
    from omni_ray.pipelines.identops import IDENTOPS_REGISTRY
    from omni_ray.pipelines.increment import INCREMENT_REGISTRY
    from omni_ray.pipelines.dssops import DSSOPS_REGISTRY
    from omni_ray.pipelines.evalops import EVALOPS_REGISTRY
    from omni_ray.pipelines.expops import EXPOPS_REGISTRY
    from omni_ray.pipelines.auditops import AUDITOPS_REGISTRY
    from omni_ray.pipelines.fitops import FITOPS_REGISTRY
    from omni_ray.pipelines.forensics2 import FORENSICS2_REGISTRY
    from omni_ray.pipelines.fpindex import FPINDEX_REGISTRY
    from omni_ray.pipelines.funnelops import FUNNELOPS_REGISTRY
    from omni_ray.pipelines.integrity import INTEGRITY_REGISTRY
    from omni_ray.pipelines.infraops import INFRAOPS_REGISTRY
    from omni_ray.pipelines.lexops import LEXOPS_REGISTRY
    from omni_ray.pipelines.lexstat2 import LEXSTAT2_REGISTRY
    from omni_ray.pipelines.linkops import LINKOPS_REGISTRY
    from omni_ray.pipelines.listops import LISTOPS_REGISTRY
    from omni_ray.pipelines.lmomops import LMOMOPS_REGISTRY
    from omni_ray.pipelines.localops import LOCALOPS_REGISTRY
    from omni_ray.pipelines.mediaops import MEDIAOPS_REGISTRY
    from omni_ray.pipelines.mraops import MRAOPS_REGISTRY
    from omni_ray.pipelines.opsaudit import OPSAUDIT_REGISTRY
    from omni_ray.pipelines.opsmisc import OPSMISC_REGISTRY
    from omni_ray.pipelines.paradoxops import PARADOXOPS_REGISTRY
    from omni_ray.pipelines.planstats import PLANSTATS_REGISTRY
    from omni_ray.pipelines.searchx import SEARCHX_REGISTRY
    from omni_ray.pipelines.mlqueries import ML_REGISTRY
    from omni_ray.pipelines.queries import REGISTRY
    from omni_ray.pipelines.rankops import RANKOPS_REGISTRY
    from omni_ray.pipelines.remedyops import REMEDYOPS_REGISTRY
    from omni_ray.pipelines.renewops import RENEWOPS_REGISTRY
    from omni_ray.pipelines.relscale import RELSCALE_REGISTRY
    from omni_ray.pipelines.tpchx import TPCHX_REGISTRY
    from omni_ray.pipelines.urltmpl import URLTMPL_REGISTRY
    from omni_ray.pipelines.cuckooaudit import CUCKOOAUDIT_REGISTRY
    from omni_ray.pipelines.styleops import STYLEOPS_REGISTRY
    from omni_ray.pipelines.interop import INTEROP_REGISTRY
    from omni_ray.pipelines.holdout import HOLDOUT_REGISTRY
    from omni_ray.pipelines.linkage import LINKAGE_REGISTRY
    from omni_ray.pipelines.episodeops import EPISODEOPS_REGISTRY
    from omni_ray.pipelines.hashfeat import HASHFEAT_REGISTRY
    from omni_ray.pipelines.mlprep import MLPREP_REGISTRY
    from omni_ray.pipelines.funnelx import FUNNELX_REGISTRY
    from omni_ray.pipelines.robotsops import ROBOTSOPS_REGISTRY
    from omni_ray.pipelines.discoveryops import DISCOVERYOPS_REGISTRY
    from omni_ray.pipelines.htmlqueries import HTMLQUERIES_REGISTRY
    from omni_ray.pipelines.enrichqueries import ENRICHQUERIES_REGISTRY
    from omni_ray.pipelines.kernelmisc import KERNELMISC_REGISTRY
    from omni_ray.pipelines.tpchx2 import TPCHX2_REGISTRY
    from omni_ray.pipelines.trainplan import TRAINPLAN_REGISTRY
    from omni_ray.pipelines.halflife import HALFLIFE_REGISTRY
    from omni_ray.pipelines.contcrawl import CONTCRAWL_REGISTRY
    from omni_ray.pipelines.fetchchain import FETCHCHAIN_REGISTRY
    from omni_ray.pipelines.shardops import SHARDOPS_REGISTRY
    from omni_ray.pipelines.lineageops import LINEAGEOPS_REGISTRY
    from omni_ray.pipelines.cdxops import CDXOPS_REGISTRY
    from omni_ray.pipelines.robotschain import ROBOTSCHAIN_REGISTRY
    from omni_ray.pipelines.revalops import REVALPLAN_REGISTRY
    from omni_ray.pipelines.heavyhitters import HEAVYHITTERS_REGISTRY
    from omni_ray.pipelines.heavychange import HEAVYCHANGE_REGISTRY
    from omni_ray.pipelines.mrlops import MRLOPS_REGISTRY
    from omni_ray.pipelines.trapops import TRAPOPS_REGISTRY
    from omni_ray.pipelines.specops import SPECOPS_REGISTRY
    from omni_ray.pipelines.sketchops import SKETCHOPS_REGISTRY
    from omni_ray.pipelines.spandedup import SPANDEDUP_REGISTRY
    from omni_ray.pipelines.stumpops import STUMPOPS_REGISTRY
    from omni_ray.pipelines.statops import STATOPS_REGISTRY
    from omni_ray.pipelines.allocops import ALLOCOPS_REGISTRY
    from omni_ray.pipelines.richops import RICHOPS_REGISTRY
    from omni_ray.pipelines.rleops import RLEOPS_REGISTRY
    from omni_ray.pipelines.robustops import ROBUSTOPS_REGISTRY
    from omni_ray.pipelines.tsops import TSOPS_REGISTRY
    from omni_ray.pipelines.sysops import SYSOPS_REGISTRY
    from omni_ray.pipelines.tailops import TAILOPS_REGISTRY
    from omni_ray.pipelines.trainprep import TRAINPREP_REGISTRY
    from omni_ray.pipelines.curation import CURATION_REGISTRY
    from omni_ray.pipelines.midops import MIDOPS_REGISTRY
    from omni_ray.pipelines.mixgraph import MIXGRAPH_REGISTRY
    from omni_ray.pipelines.varops import VAROPS_REGISTRY
    from omni_ray.pipelines.vecsketch import VECSKETCH_REGISTRY
    from omni_ray.pipelines.voteops import VOTEOPS_REGISTRY
    from omni_ray.pipelines.webqa import WEBQA_REGISTRY
    from omni_ray.pipelines.webscaleops import WEBSCALE_REGISTRY

    out = {name: sql for name, (_fn, sql) in REGISTRY.items()}
    out.update({name: sql for name, (_fn, sql) in SPANDEDUP_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ML_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CORPUS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TRAINPREP_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in GRAPH_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in RELSCALE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in STATOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MEDIAOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ENGINEOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in WEBSCALE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in WEBQA_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CURATION_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MIXGRAPH_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in VECSKETCH_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ASSOCOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in INCREMENT_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ESTMINE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in GOVERNANCE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in PLANSTATS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in SEARCHX_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in GROWTH_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in OPSAUDIT_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in INFRAOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ADVISORY_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in INTEGRITY_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FPINDEX_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in EVALOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in DSSOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TSOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ROBUSTOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ALLOCOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in EXPOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MRAOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in SPECOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in VAROPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LINKOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in SKETCHOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in RANKOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in REMEDYOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FITOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in AUDITOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LEXOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in PARADOXOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in SYSOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ESTOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CIRCOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in STUMPOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in BOUNDOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in RICHOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LEXSTAT2_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in VOTEOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LISTOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in AUCTESTS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MIDOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TAILOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in OPSMISC_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FORENSICS2_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CATOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LMOMOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in RENEWOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TPCHX_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in URLTMPL_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CUCKOOAUDIT_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in STYLEOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in INTEROP_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HOLDOUT_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LINKAGE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in EPISODEOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HASHFEAT_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MLPREP_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FUNNELX_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ROBOTSOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in DISCOVERYOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HTMLQUERIES_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ENRICHQUERIES_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in KERNELMISC_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TPCHX2_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TRAINPLAN_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HALFLIFE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CONTCRAWL_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FETCHCHAIN_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in SHARDOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LINEAGEOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in CDXOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in ROBOTSCHAIN_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in REVALPLAN_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HEAVYHITTERS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in HEAVYCHANGE_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in MRLOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in TRAPOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in IDENTOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in FUNNELOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in LOCALOPS_REGISTRY.items()})
    out.update({name: sql for name, (_fn, sql) in RLEOPS_REGISTRY.items()})
    return out
