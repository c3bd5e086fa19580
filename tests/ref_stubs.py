"""Import shims to load /root/reference's nbdt library offline
(pytorchcv/torchvision/cv2 absent; only the tree+rules path is used)."""
import sys, types

def install():
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    none_fn = lambda *a, **k: None
    mod("pytorchcv"); mod("pytorchcv.models")
    mod("pytorchcv.models.wrn_cifar", wrn28_10_cifar10=none_fn,
        wrn28_10_cifar100=none_fn, get_wrn_cifar=none_fn)
    e = mod("pytorchcv.models.efficientnet"); e.__all__ = []
    mod("pytorchcv.models.common")
    mod("torchvision")
    mod("torchvision.datasets", ImageFolder=object, CIFAR10=object,
        CIFAR100=object)
    mod("torchvision.transforms", **{k: (lambda *a, **kw: (lambda x: x))
        for k in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
                  "RandomCrop", "RandomHorizontalFlip")})
    m = mod("torchvision.models"); m.__all__ = []
    mod("cv2")
    # networkx >= 3.4 renamed the node-link default from "links" to
    # "edges"; the shipped graphs use "links".
    import functools

    from networkx.readwrite import json_graph as _jg

    # installed unconditionally: the KeyError retry is version-safe
    # (probing __kwdefaults__ first raised TypeError on networkx versions
    # where it is None, and the probe was dead code anyway)
    _orig = _jg.node_link_graph

    @functools.wraps(_orig)
    def _node_link_graph(data, *a, **kw):
        try:
            return _orig(data, *a, **kw)
        except KeyError:
            kw.setdefault("edges", "links")
            return _orig(data, *a, **kw)

    _jg.node_link_graph = _node_link_graph
    try:
        import networkx as _nx

        _nx.node_link_graph = _node_link_graph
    except Exception:
        pass

    # sklearn >= 1.4 renamed AgglomerativeClustering(affinity=) to metric=.
    try:
        from sklearn import cluster as _skc

        _AC = _skc.AgglomerativeClustering

        def _compat_ac(*a, affinity=None, **kw):
            if affinity is not None and affinity != "euclidean":
                kw.setdefault("metric", affinity)
            return _AC(*a, **kw)

        _skc.AgglomerativeClustering = _compat_ac
        import sklearn.cluster

        sklearn.cluster.AgglomerativeClustering = _compat_ac
    except Exception:
        pass

    sys.path.insert(0, "/root/reference")

install()
