import numpy as np
import networkx as nx
import pytest

from visitron_tpu.graph import NavGraph


def _nx_graph(graph: NavGraph) -> nx.Graph:
    G = nx.Graph()
    G.add_nodes_from(range(graph.num_viewpoints))
    for u in range(graph.num_viewpoints):
        for v in graph.neighbors(u):
            d = float(np.linalg.norm(graph.positions[u] - graph.positions[v]))
            G.add_edge(u, int(v), weight=d)
    return G


def test_distances_match_networkx(world):
    for scan, g in world.graphs.items():
        G = _nx_graph(g)
        lengths = dict(nx.all_pairs_dijkstra_path_length(G))
        for u in range(g.num_viewpoints):
            for v in range(g.num_viewpoints):
                np.testing.assert_allclose(g.dist[u, v], lengths[u][v], rtol=1e-5)


def test_shortest_path_valid_and_optimal(world):
    g = next(iter(world.graphs.values()))
    rng = np.random.default_rng(0)
    for _ in range(20):
        u, v = rng.integers(g.num_viewpoints, size=2)
        path = g.shortest_path(int(u), int(v))
        assert path[0] == g.viewpoints[u] and path[-1] == g.viewpoints[v]
        total = g.path_length(path)
        np.testing.assert_allclose(total, g.dist[u, v], rtol=1e-5)
        for a, b in zip(path[:-1], path[1:]):
            assert g.adjacency[g.index[a], g.index[b]]


def test_next_on_path_teacher_semantics(world):
    g = next(iter(world.graphs.values()))
    u = g.viewpoints[0]
    assert g.next_on_path(u, u) == u  # "stay here" at goal
    v = g.viewpoints[g.num_viewpoints - 1]
    nxt = g.next_on_path(u, v)
    assert g.adjacency[g.index[u], g.index[nxt]]
    # One hop along reduces remaining distance by the edge length.
    np.testing.assert_allclose(
        g.distance(u, v), g.distance(u, nxt) + g.distance(nxt, v), rtol=1e-5
    )


def test_undirected_validation():
    entries = [
        {"image_id": "a", "pose": [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1],
         "included": True, "height": 0.0, "unobstructed": [False, True]},
        {"image_id": "b", "pose": [1,0,0,1, 0,1,0,0, 0,0,1,0, 0,0,0,1],
         "included": True, "height": 0.0, "unobstructed": [False, False]},
    ]
    with pytest.raises(ValueError):
        NavGraph.from_connectivity("bad", entries)


def test_load_roundtrip(tmp_path, world):
    d = world.write_connectivity(str(tmp_path))
    g0 = world.graphs[world.scans[0]]
    g1 = NavGraph.load(d, world.scans[0])
    assert g0.viewpoints == g1.viewpoints
    np.testing.assert_allclose(g0.dist, g1.dist, rtol=1e-6)
    np.testing.assert_array_equal(g0.next_hop, g1.next_hop)
