"""Universal/flux/nanoreactor/IDPP-bias/CFB-ENM potentials."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.potentials import BiasEngine, get_potential


@pytest.fixture
def cluster(rng):
    return jnp.asarray(rng.normal(size=(5, 3)) * 3.0)


def test_universal_contracts(cluster):
    eng = BiasEngine([get_potential("universal", const=100.0,
                                    atoms=[1, 2, 3, 4, 5])])
    e, g = eng.energy_and_gradient(cluster)
    assert float(e) > 0.0
    # gradient points outward from the centroid -> force contracts
    centroid = jnp.mean(cluster, axis=0)
    outward = cluster - centroid
    assert float(jnp.sum(g * outward)) > 0.0


def test_flux_even_order_minimum_at_target(cluster):
    target = [1.0, 0.0, 0.0]
    pot = get_potential("flux", const=0.5, order=2.0, direction=target,
                        atoms=[1, 2])
    eng = BiasEngine([pot])
    at_target = jnp.zeros((5, 3)).at[:2].set(
        jnp.asarray(target) * 1.8897261254578281)
    assert float(eng.total_energy(at_target)) < float(eng.total_energy(cluster))


def test_nanoreactor_phases():
    pot = get_potential("nanoreactor", inner_wall_ang=2.0, outer_wall_ang=5.0,
                        contraction_time=100.0, expansion_time=100.0,
                        contraction_k=1e-4, expansion_k=1e-4,
                        element_z=[18, 18])
    coords = jnp.array([[0.0, 0.0, 0.0], [6.0, 0.0, 0.0]])  # r=6 > inner
    import jax
    # contraction phase (t=0): wall at inner radius -> penalty
    e_c = float(pot.energy(coords, jnp.array([0.0])))
    # expansion phase (t=150): wall at outer radius (9.45 bohr) -> none
    e_e = float(pot.energy(coords, jnp.array([150.0])))
    assert e_c > 0.0
    assert e_e == pytest.approx(0.0, abs=1e-12)


def test_idpp_bias_zero_at_target(cluster):
    pot = get_potential("idpp_bias", target_coords=np.asarray(cluster))
    eng = BiasEngine([pot])
    assert float(eng.total_energy(cluster)) == pytest.approx(0.0, abs=1e-12)
    assert float(eng.total_energy(cluster * 1.2)) > 0.0


def test_cfb_enm_flat_bottom():
    ref = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
    pot = get_potential("cfb_enm", reference_coords=ref,
                        element_z=[6, 6, 6], k=1.0, tolerance=0.2)
    eng = BiasEngine([pot])
    coords = jnp.asarray(ref)
    # inside the tolerance band: zero
    assert float(eng.total_energy(coords)) == 0.0
    small = coords.at[1, 0].add(0.1)
    assert float(eng.total_energy(small)) == 0.0
    big = coords.at[1, 0].add(0.5)
    assert float(eng.total_energy(big)) > 0.0
