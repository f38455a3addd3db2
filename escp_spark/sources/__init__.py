from .tables import IndexLayout, read_web_pages, publish_manifest, load_manifest

__all__ = ["IndexLayout", "read_web_pages", "publish_manifest", "load_manifest"]
