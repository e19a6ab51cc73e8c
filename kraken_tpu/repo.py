"""
kraken_tpu.repo
~~~~~~~~~~~~~~~

Model repository client (reference: kraken/repo.py): thin wrappers around the
htrmopo Zenodo client filtering for kraken-compatible records. The htrmopo
package is optional; all entry points raise a clear error when it is missing
or the environment has no network access.
"""
import logging
from typing import Any, Optional

from kraken_tpu.exceptions import KrakenRepoException

logger = logging.getLogger(__name__)

__all__ = ['get_description', 'get_listing', 'get_model', 'publish_model']


def _htrmopo():
    try:
        import htrmopo
        return htrmopo
    except ImportError as e:
        raise KrakenRepoException(
            'Model repository access requires the `htrmopo` package which is not '
            'installed in this environment.') from e


def get_description(model_id: str, version: Optional[str] = None,
                    callback=lambda: None) -> dict[str, Any]:
    """
    Fetches the metadata record of a model.
    """
    mopo = _htrmopo()
    desc = mopo.get_description(model_id, callback=callback, version=version)
    if getattr(desc, 'software_name', 'kraken') != 'kraken' or \
            'kraken_pytorch' not in getattr(desc, 'keywords', ['kraken_pytorch']):
        raise KrakenRepoException('Record exists but is not a kraken-compatible model')
    return desc if isinstance(desc, dict) else vars(desc)


def get_listing(model_type: str = 'all', language=None, script=None,
                keyword=None, callback=lambda total, advance: None) -> dict[str, Any]:
    """
    Lists kraken-compatible records in the repository, grouped by concept
    DOI with only the newest version retained.
    """
    mopo = _htrmopo()
    full = mopo.get_listing(callback=callback)
    records = {}
    for concept_id, versions in full.items():
        best = None
        for v in (versions.values() if isinstance(versions, dict) else versions):
            meta = v if isinstance(v, dict) else vars(v)
            if meta.get('software_name', 'kraken') != 'kraken':
                continue
            if best is None or meta.get('publication_date', '') > best.get('publication_date', ''):
                best = meta
        if best is None:
            continue
        if model_type != 'all' and model_type not in best.get('model_type', [model_type]):
            continue
        if language and not set(language) & set(best.get('language', [])):
            continue
        if script and not set(script) & set(best.get('script', [])):
            continue
        if keyword and not set(keyword) & set(best.get('keywords', [])):
            continue
        records[concept_id] = best
    return records


def get_model(model_id: str, path: Optional[str] = None,
              callback=lambda total, advance: None) -> str:
    """
    Downloads a model archive, returning the directory it was placed in.
    """
    mopo = _htrmopo()
    return mopo.get_model(model_id, path, callback=callback)


def publish_model(model_card: dict, model_path, access_token: str,
                  private: bool = False, callback=lambda total, advance: None) -> str:
    """
    Publishes a model to the repository, returning the new DOI.
    """
    mopo = _htrmopo()
    return mopo.publish_model(model_path, model_card, access_token,
                              private=private, callback=callback)


def update_model(doi: str, model_card: dict, model_path, access_token: str,
                 private: bool = False, callback=lambda total, advance: None) -> str:
    """
    Updates an existing repository record, returning the new version DOI
    (reference: ketos/repo.py --doi → htrmopo.update_model).
    """
    mopo = _htrmopo()
    return mopo.update_model(model_path, model_card, access_token,
                             model_id=doi, private=private, callback=callback)
