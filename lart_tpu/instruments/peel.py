"""Peeling-off (next-event estimation) to external observers.

Rebuilds the peelingoff_rect family (reference: src/peelingoff_rect.f90:
24-690): at emission and at every scattering event, for each observer the
escape probability along the sightline is computed (tau-to-edge raytrace with
comoving frequency updates), weighted by the phase function / redistribution
probability evaluated for the observer direction, and deposited into
(nxfreq, nxim, nyim) spectral image cubes (TAN projection).

TPU design: observers become a leading broadcast axis (nobs, B); the
tau-to-edge integration is one lockstep DDA while_loop over all
(observer, lane) pairs, early-exiting at tau > 745.2 (raytrace_car.f90:106).
Deposits are flat scatter-adds into the cube.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ResolvedConfig
from ..grid.cartesian import GridDevice, GridMeta
from .observer import ObserverSetMeta, ObserverDevice

RAD2DEG = 180.0 / math.pi
TAU_HUGE = 745.2
BIG = jnp.float32(3.0e38)
TINY = jnp.float32(1e-30)
FOURPI = 4.0 * math.pi


class PeelCubes(NamedTuple):
    """Flat (nobs*nxfreq*nxim*nyim,) accumulation cubes (f32)."""
    scatt: jnp.ndarray
    direc: jnp.ndarray
    I: jnp.ndarray          # None unless use_stokes
    Q: jnp.ndarray
    U: jnp.ndarray
    V: jnp.ndarray
    Ha: jnp.ndarray = None  # band-2 (H-alpha) cube, ly_beta runs only
    direc0: jnp.ndarray = None  # unattenuated stellar direct (save_direc0)


def zero_cubes(cfg: ResolvedConfig, meta: GridMeta, obs: ObserverSetMeta
               ) -> PeelCubes:
    n = obs.nobs * meta.nxfreq * obs.nxim * obs.nyim
    z = jnp.zeros((n,), jnp.float32)
    st = cfg.par.use_stokes
    stellar = cfg.par.source_geometry.strip().lower() \
        == 'stellar_illumination'
    return PeelCubes(scatt=z, direc=z,
                     I=z if st else None, Q=z if st else None,
                     U=z if st else None, V=z if st else None,
                     Ha=z if cfg.line.line_type == 8 else None,
                     direc0=z if (stellar and cfg.par.save_direc0)
                     else None)


def make_peel(cfg: ResolvedConfig, meta: GridMeta, obs: ObserverSetMeta,
              cmeta=None):
    """Build the peel kernels. All returned fns operate on full (B,) batches
    with an `active` mask and deposit into PeelCubes."""
    par, line = cfg.par, cfg.line
    nx, ny, nz = meta.nx, meta.ny, meta.nz
    dx, dy, dz = meta.dx, meta.dy, meta.dz
    xmn, ymn, zmn = meta.xmin, meta.ymin, meta.zmin
    nxim, nyim, nxfreq = obs.nxim, obs.nyim, meta.nxfreq

    from ..transport.engine import (_gather, amr_descend_from_face,
                                    cell_Dfreq, cell_rhokap, cell_rhokapD,
                                    cell_velocity_dot, cell_voigt_a,
                                    h2_setup, line_profile)
    h2 = h2_setup(cfg)

    # ------------------------------------------------------------------
    # clump medium: chord-overlap tau along a fixed direction
    # (raytrace_to_edge_clump[_capped/_overlap], raytrace_clump.f90:
    # 205-337, 792-1130): per CSR cell, tau is the exact sum of
    # per-candidate ray-sphere chord overlaps at the GLOBAL frequency with
    # per-clump u_los shifts -- exact for overlapping and non-overlapping
    # populations alike
    # ------------------------------------------------------------------
    def tau_to_edge_clump(grid, x, y, z, kx, ky, kz, xfreq, active,
                          max_steps, cap=None):
        from ..transport.engine import _leaf_gather, clump_xloc_ratio
        r_loc = clump_xloc_ratio(meta)
        a_loc = meta.voigt_a_cl if meta.Dfreq_cl > 0 else meta.voigt_a_ref
        D_loc = meta.Dfreq_cl if meta.Dfreq_cl > 0 else meta.Dfreq_ref
        R = meta.xmax
        cg_n, cg_dx, K = cmeta.cg_n, cmeta.cg_dx, cmeta.K
        EPS = jnp.float32(1e-6 * R)

        def cond(c):
            (x, y, z, tau, trav, live), n = c
            return jnp.logical_and(n < max_steps, jnp.any(live))

        def body(c):
            (x, y, z, tau, trav, live), n = c
            ci = jnp.clip(jnp.floor((x + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            cj = jnp.clip(jnp.floor((y + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            ck = jnp.clip(jnp.floor((z + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            cell = (ci * cg_n + cj) * cg_n + ck

            def fd(pos, k, idx):
                up = k > 0.0
                face = -R + jnp.where(up, idx + 1, idx
                                      ).astype(jnp.float32) * cg_dx
                t = (face - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                             jnp.float32(1.0), k)
                return jnp.where(jnp.abs(k) < 1e-12, BIG,
                                 jnp.maximum(t, 0.0))
            t_end = jnp.minimum(jnp.minimum(fd(x, kx, ci), fd(y, ky, cj)),
                                fd(z, kz, ck)) + EPS
            if cap is not None:
                dleft = jnp.maximum(cap - trav, 0.0)
                hit_cap = t_end >= dleft
                t_end = jnp.minimum(t_end, dleft)
            else:
                hit_cap = jnp.zeros_like(live)
            dtau = jnp.zeros_like(x)
            for q in range(K):
                cand = jnp.take(grid.table.reshape(-1), cell * K + q,
                                mode='clip')
                ok = cand >= 0
                qx = _leaf_gather(grid.x, cand, 0.0)
                qy = _leaf_gather(grid.y, cand, 0.0)
                qz = _leaf_gather(grid.z, cand, 0.0)
                qr2 = _leaf_gather(grid.r2, cand, 0.0)
                ex, ey, ez = x - qx, y - qy, z - qz
                eb = ex * kx + ey * ky + ez * kz
                ec = ex * ex + ey * ey + ez * ez - qr2
                edet = eb * eb - ec
                sq = jnp.sqrt(jnp.maximum(edet, 0.0))
                t0 = jnp.clip(-eb - sq, 0.0, t_end)
                t1 = jnp.clip(-eb + sq, 0.0, t_end)
                u_q = ((_leaf_gather(grid.vx, cand, 0.0) * kx
                        + _leaf_gather(grid.vy, cand, 0.0) * ky
                        + _leaf_gather(grid.vz, cand, 0.0) * kz)
                       / r_loc) if not meta.static_medium else 0.0
                kq = _leaf_gather(grid.rhokap, cand, 0.0) \
                    * line_profile(cfg, (xfreq - u_q) * r_loc,
                                   jnp.float32(a_loc), jnp.float32(D_loc))
                if meta.has_dust:
                    kq = kq + _leaf_gather(grid.rhokapD, cand, 0.0)
                kq = jnp.where(jnp.logical_and(ok, edet > 0.0), kq, 0.0)
                dtau = dtau + kq * (t1 - t0)
            tau_n = jnp.where(live, tau + dtau, tau)
            xn = jnp.where(live, x + t_end * kx, x)
            yn = jnp.where(live, y + t_end * ky, y)
            zn = jnp.where(live, z + t_end * kz, z)
            trav_n = jnp.where(live, trav + t_end, trav)
            out = jnp.logical_or(jnp.logical_or(jnp.abs(xn) >= R,
                                                jnp.abs(yn) >= R),
                                 jnp.abs(zn) >= R)
            live = jnp.logical_and(live, ~out)
            live = jnp.logical_and(live, ~hit_cap)
            live = jnp.logical_and(live, tau_n < TAU_HUGE)
            return (xn, yn, zn, tau_n, trav_n, live), n + 1

        carry = ((x, y, z, jnp.zeros_like(x), jnp.zeros_like(x), active),
                 jnp.int32(0))
        (out, _) = jax.lax.while_loop(cond, body, carry)
        return out[3]

    # ------------------------------------------------------------------
    # tau to the grid edge along a fixed direction (per (nobs, B) lane)
    # ------------------------------------------------------------------
    R_Ha = par.cext_dust_Ha / par.cext_dust if par.cext_dust > 0 else 0.0

    def tau_to_edge_cart(grid, x, y, z, ic, jc, kc, kx, ky, kz, xfreq,
                         active, max_steps, cap=None, iband=None):
        """Lockstep DDA accumulating optical depth to the boundary; respects
        the same periodic/reflect boundary ops as the transport raytrace
        (raytrace_to_edge_* family).  With `cap` (per-lane distance), the
        integration stops at that path length instead of the edge -- the
        raytrace_to_dist contract used by interior observers
        (peeling_*_inside, reference src/peelingoff_heal.f90:12-251)."""

        def face_dist(pos, k, idx, amin, d, n, skip):
            if skip:
                return jnp.broadcast_to(BIG, pos.shape)
            up = k > 0.0
            face = amin + jnp.where(up, idx + 1, idx).astype(jnp.float32) * d
            t = (face - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                         jnp.float32(1.0), k)
            return jnp.where(jnp.abs(k) < 1e-12, BIG, jnp.maximum(t, 0.0))

        skip_x = (nx == 1 and meta.bc_x != 'escape')
        skip_y = (ny == 1 and meta.bc_y != 'escape')

        def cross(bc, n, amin, amax, i0, idx, pos, k, step):
            nidx = idx + step
            out_lo = nidx < 0
            out_hi = nidx >= n
            if bc == 'escape':
                return nidx, pos, k, jnp.logical_or(out_lo, out_hi)
            if bc == 'periodic':
                nidx = jnp.where(out_lo, n - 1, jnp.where(out_hi, 0, nidx))
                pos = jnp.where(out_lo, jnp.float32(amax),
                                jnp.where(out_hi, jnp.float32(amin), pos))
                return nidx, pos, k, jnp.zeros_like(out_lo)
            if bc == 'reflect':
                nidx = jnp.where(out_lo, i0 - 1, nidx)
                pos = jnp.where(out_lo, jnp.float32(-amin), pos)
                k = jnp.where(out_lo, -k, k)
                return nidx, pos, k, out_hi
            raise ValueError(bc)

        xmx = xmn + nx * dx
        ymx = ymn + ny * dy
        zmx = zmn + nz * dz

        def cond(c):
            (x, y, z, ic, jc, kc, kx, ky, kz, xf, tau, trav, live), n = c
            return jnp.logical_and(n < max_steps, jnp.any(live))

        def body(c):
            (x, y, z, ic, jc, kc, kx, ky, kz, xf, tau, trav, live), n = c
            a_cell = cell_voigt_a(grid, meta, ic, jc, kc)
            D_cell = cell_Dfreq(grid, meta, ic, jc, kc)
            rk = cell_rhokap(grid, meta, ic, jc, kc)
            rho = rk * line_profile(cfg, xf, a_cell, D_cell)
            if h2 is not None:
                from ..physics.h2 import h2_kappa
                rho = rho + rk * h2_kappa(h2, xf, D_cell)
            if meta.has_dust:
                rho = rho + cell_rhokapD(grid, meta, ic, jc, kc)
            if iband is not None:
                # band 2 (H-alpha) sightlines see dust only, scaled to the
                # H-alpha extinction (peeling_dust_Ha_outside,
                # peelingoff_rect.f90:801-871)
                rho2 = (cell_rhokapD(grid, meta, ic, jc, kc) * R_Ha
                        if meta.has_dust else jnp.zeros_like(rho))
                rho = jnp.where(iband == 2, rho2, rho)

            if meta.grid_type == 'amr':
                ccx = jnp.take(grid.node_cx, ic, mode='clip')
                ccy = jnp.take(grid.node_cy, ic, mode='clip')
                ccz = jnp.take(grid.node_cz, ic, mode='clip')
                hh = jnp.take(grid.node_ch, ic, mode='clip')

                def axis_t(pos, k, c0):
                    fc = c0 + jnp.where(k > 0, hh, -hh)
                    t = (fc - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                               jnp.float32(1.0), k)
                    return jnp.where(jnp.abs(k) < 1e-12, BIG,
                                     jnp.maximum(t, 0.0))

                tx = axis_t(x, kx, ccx)
                ty = axis_t(y, ky, ccy)
                tz = axis_t(z, kz, ccz)
                dmin = jnp.minimum(jnp.minimum(tx, ty), tz)
                axis = jnp.where(dmin == tx, 0, jnp.where(dmin == ty, 1, 2))
                if cap is not None:
                    dleft = jnp.maximum(cap - trav, 0.0)
                    hit_cap = dmin >= dleft
                    dstep = jnp.minimum(dmin, dleft)
                else:
                    hit_cap = jnp.zeros_like(live)
                    dstep = dmin
                tau_n = jnp.where(live, tau + dstep * rho, tau)
                kax = jnp.where(axis == 0, kx, jnp.where(axis == 1, ky, kz))
                face = axis * 2 + jnp.where(kax > 0, 0, 1)
                fxp = ccx + jnp.where(kx > 0, hh, -hh)
                fyp = ccy + jnp.where(ky > 0, hh, -hh)
                fzp = ccz + jnp.where(kz > 0, hh, -hh)
                xn = jnp.where(live,
                               jnp.where(axis == 0, fxp, x + dmin * kx), x)
                yn = jnp.where(live,
                               jnp.where(axis == 1, fyp, y + dmin * ky), y)
                zn = jnp.where(live,
                               jnp.where(axis == 2, fzp, z + dmin * kz), z)
                nb = jnp.take(grid.neighbor.reshape(-1),
                              jnp.maximum(ic, 0) * 6 + face, mode='clip')
                esc = jnp.logical_and(live, nb < 0)
                icn = amr_descend_from_face(grid, meta, jnp.maximum(nb, 0),
                                            face, xn, yn, zn)
                icn = jnp.where(jnp.logical_and(live, ~esc), icn, ic)
                jcn, kcn = jc, kc
                kxn, kyn, kzn = kx, ky, kz
            else:
                tx = face_dist(x, kx, ic, xmn, dx, nx, skip_x)
                ty = face_dist(y, ky, jc, ymn, dy, ny, skip_y)
                tz = face_dist(z, kz, kc, zmn, dz, nz, False)
                dmin = jnp.minimum(jnp.minimum(tx, ty), tz)
                axis = jnp.where(dmin == tx, 0, jnp.where(dmin == ty, 1, 2))
                if cap is not None:
                    dleft = jnp.maximum(cap - trav, 0.0)
                    hit_cap = dmin >= dleft
                    dstep = jnp.minimum(dmin, dleft)
                else:
                    hit_cap = jnp.zeros_like(live)
                    dstep = dmin
                tau_n = jnp.where(live, tau + dstep * rho, tau)

                stx = jnp.where(kx > 0, 1, -1)
                sty = jnp.where(ky > 0, 1, -1)
                stz = jnp.where(kz > 0, 1, -1)
                ic2, xb, kx2, ex = cross(meta.bc_x, nx, xmn, xmx, meta.i0,
                                         ic, x + dmin * kx, kx, stx)
                jc2, yb, ky2, ey = cross(meta.bc_y, ny, ymn, ymx, meta.j0,
                                         jc, y + dmin * ky, ky, sty)
                kc2, zb, kz2, ez = cross(meta.bc_z, nz, zmn, zmx, meta.k0,
                                         kc, z + dmin * kz, kz, stz)
                cx = jnp.logical_and(live, axis == 0)
                cy = jnp.logical_and(live, axis == 1)
                cz = jnp.logical_and(live, axis == 2)
                xn = jnp.where(cx, xb, jnp.where(live, x + dmin * kx, x))
                yn = jnp.where(cy, yb, jnp.where(live, y + dmin * ky, y))
                zn = jnp.where(cz, zb, jnp.where(live, z + dmin * kz, z))
                icn = jnp.where(cx, ic2, ic)
                jcn = jnp.where(cy, jc2, jc)
                kcn = jnp.where(cz, kc2, kc)
                kxn = jnp.where(cx, kx2, kx)
                kyn = jnp.where(cy, ky2, ky)
                kzn = jnp.where(cz, kz2, kz)
                esc = jnp.logical_or(jnp.logical_or(
                    jnp.logical_and(cx, ex), jnp.logical_and(cy, ey)),
                    jnp.logical_and(cz, ez))
                if meta.atmosphere == 2 and grid.mask is not None:
                    # sightline through the molecular core is opaque
                    # (raytrace_to_edge_car_atmosphere,
                    # raytrace_car.f90:3730-3734)
                    hitm = jnp.logical_and(
                        jnp.logical_and(live, ~esc),
                        _gather(grid.mask, meta, icn, jcn, kcn))
                    tau_n = jnp.where(hitm, jnp.float32(2.0 * TAU_HUGE),
                                      tau_n)

            if not meta.static_medium or not meta.uniform_temperature:
                u1 = cell_velocity_dot(grid, meta, ic, jc, kc, kx, ky, kz)
                u2 = cell_velocity_dot(grid, meta, icn, jcn, kcn,
                                       kxn, kyn, kzn)
                D2 = cell_Dfreq(grid, meta, icn, jcn, kcn)
                xfn = (xf + u1) * D_cell / D2 - u2
                xf = jnp.where(jnp.logical_and(live, ~esc), xfn, xf)

            trav_n = jnp.where(live, trav + dstep, trav)
            live = jnp.logical_and(live, ~esc)
            live = jnp.logical_and(live, ~hit_cap)
            live = jnp.logical_and(live, tau_n < TAU_HUGE)
            return (xn, yn, zn, icn, jcn, kcn, kxn, kyn, kzn, xf,
                    tau_n, trav_n, live), n + 1

        live0 = active
        tau0 = jnp.zeros_like(x)
        carry = ((x, y, z, ic, jc, kc, kx, ky, kz, xfreq, tau0,
                  jnp.zeros_like(x), live0), jnp.int32(0))
        (out, _) = jax.lax.while_loop(cond, body, carry)
        return out[10]   # tau

    if meta.grid_type == 'clump':
        def tau_to_edge(grid, x, y, z, ic, jc, kc, kx, ky, kz, xfreq,
                        active, max_steps, cap=None, iband=None):
            return tau_to_edge_clump(grid, x, y, z, kx, ky, kz, xfreq,
                                     active, max_steps, cap=cap)
        max_steps = 3 * cmeta.cg_n + 8
    else:
        from ..transport.engine import (sphere_chord,
                                        uniform_sphere_fastpath)
        if uniform_sphere_fastpath(cfg, meta):
            # uniform static sphere: the peel sightline tau is the chord
            # through r < sphere_R times the constant opacity -- no march
            # (the dominant peel cost when enabled, SURVEY.md section 3.2)
            def tau_to_edge(grid, x, y, z, ic, jc, kc, kx, ky, kz, xfreq,
                            active, max_steps, cap=None, iband=None):
                rho = (meta.sphere_rho
                       * line_profile(cfg, xfreq, meta.voigt_a_ref,
                                      meta.Dfreq_ref)
                       + meta.sphere_rhoD)
                t_in, t_out = sphere_chord(meta, x, y, z, kx, ky, kz)
                if cap is not None:
                    t_out = jnp.minimum(t_out, jnp.maximum(cap, t_in))
                    t_in = jnp.minimum(t_in, t_out)
                tau = (t_out - t_in) * rho
                return jnp.where(active, tau, 0.0)
        else:
            tau_to_edge = tau_to_edge_cart
        max_steps = 2 * (nx + ny + nz) + 8

    # ------------------------------------------------------------------
    # geometry helpers (per observer o, batch arrays)
    # ------------------------------------------------------------------
    inside = obs.inside
    if inside:
        from .healpix import vec2pix_ring

    def obs_geometry(odev: ObserverDevice, o: int, s):
        """Direction/pixel geometry toward observer o.  Returns
        (pk, r2, img_idx, in_img, cap): img_idx is the flat in-image pixel
        (TAN ix*nyim+iy outside; HEALPix RING id inside), cap is the
        distance to the observer for interior observers (tau integration
        stops there) or None."""
        ox, oy, oz = (odev.pos[o, 0], odev.pos[o, 1], odev.pos[o, 2])
        pkx, pky, pkz = ox - s.x, oy - s.y, oz - s.z
        r2 = pkx * pkx + pky * pky + pkz * pkz
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        pkx, pky, pkz = pkx / r, pky / r, pkz / r
        if inside:
            # all-sky map: pixel of the ARRIVAL direction -pk
            # (peeling_*_inside, peelingoff_heal.f90:36,127,200); events
            # at the observer position itself carry no direction and would
            # give a divergent 1/r^2 weight -> dropped
            ipix = vec2pix_ring(obs.nside, -pkx, -pky, -pkz)
            ok = r2 > jnp.float32(1e-12)
            return (pkx, pky, pkz), r2, ipix, ok, r
        R = odev.rmat[o]
        kx = R[0, 0] * pkx + R[0, 1] * pky + R[0, 2] * pkz
        ky = R[1, 0] * pkx + R[1, 1] * pky + R[1, 2] * pkz
        kz = R[2, 0] * pkx + R[2, 1] * pky + R[2, 2] * pkz
        ix = jnp.floor(jnp.arctan2(-kx, kz) * RAD2DEG / obs.dxim
                       + nxim / 2.0).astype(jnp.int32)
        iy = jnp.floor(jnp.arctan2(-ky, kz) * RAD2DEG / obs.dyim
                       + nyim / 2.0).astype(jnp.int32)
        in_img = jnp.logical_and(jnp.logical_and(ix >= 0, ix < nxim),
                                 jnp.logical_and(iy >= 0, iy < nyim))
        img = (jnp.clip(ix, 0, nxim - 1) * nyim
               + jnp.clip(iy, 0, nyim - 1))
        return (pkx, pky, pkz), r2, img, in_img, None

    def flat_idx(o, ixf, img):
        return (o * nxfreq + ixf) * (nxim * nyim) + img

    def freq_bin(grid, s, pk, xfreq_com, iband=None):
        """Comoving frequency at the event cell -> lab bin index.  Band-2
        frequencies are already lab-frame in reference Doppler units
        (peeling_dust_Ha_outside): no fluid shift, no Dfreq scaling."""
        D_cell = cell_Dfreq(grid, meta, s.ic, s.jc, s.kc)
        u1 = cell_velocity_dot(grid, meta, s.ic, s.jc, s.kc, *pk)
        xr = (xfreq_com + u1) * (D_cell / meta.Dfreq_ref)
        if iband is not None:
            xr = jnp.where(iband == 2, xfreq_com, xr)
        ixf = jnp.floor((xr - meta.xfreq_min) / meta.dxfreq).astype(jnp.int32)
        ok = jnp.logical_and(ixf >= 0, ixf < nxfreq)
        return ixf, ok

    # ------------------------------------------------------------------
    # peel kernels
    # ------------------------------------------------------------------
    def peel_direct(cubes: PeelCubes, grid, odev, s, active, key=None):
        """Direct (unscattered) peel at emission (peeling_direct_outside,
        peelingoff_rect.f90:24-129)."""
        direc = cubes.direc
        I = cubes.I
        for o in range(obs.nobs):
            pk, r2, img, in_img, cap = obs_geometry(odev, o, s)
            # comoving-source convention: peel frequency toward the observer
            xfreq_peel = s.xfreq
            if not par.comoving_source and not meta.static_medium:
                uk = cell_velocity_dot(grid, meta, s.ic, s.jc, s.kc,
                                       s.kx, s.ky, s.kz)
                uo = cell_velocity_dot(grid, meta, s.ic, s.jc, s.kc, *pk)
                xfreq_peel = s.xfreq + uk - uo
            ixf, okf = freq_bin(grid, s, pk, xfreq_peel)
            act = jnp.logical_and(active, in_img)
            tau = tau_to_edge(grid, s.x, s.y, s.z, s.ic, s.jc, s.kc,
                              pk[0], pk[1], pk[2], xfreq_peel, act, max_steps,
                              cap=cap)
            wgt = jnp.exp(-jnp.minimum(tau, 700.0)) / (FOURPI * r2) * s.wgt
            dep = jnp.where(jnp.logical_and(act, okf), wgt, 0.0)
            idx = flat_idx(o, jnp.clip(ixf, 0, nxfreq - 1), img)
            direc = direc.at[idx].add(dep)
            if par.use_stokes:
                I = I.at[idx].add(dep)
        out = cubes._replace(direc=direc)
        if par.use_stokes:
            out = out._replace(I=I)
        return out

    def peel_resonance(cubes: PeelCubes, grid, odev, s, active,
                       xfreq_atom, ua_x, ua_y, ua_z):
        """Resonance peel at a scattering event, BEFORE the direction/triad
        update (peeling_resonance_[no]stokes_outside,
        peelingoff_rect.f90:303-690).  E1/E2/E3 ride on lane state via the
        caller (passed through s_E* arrays)."""
        scatt = cubes.scatt
        I, Q, U, V = cubes.I, cubes.Q, cubes.U, cubes.V
        E1, E2, E3 = s['E1'], s['E2'], s['E3']
        ph = s['state']
        D_cell = cell_Dfreq(grid, meta, ph.ic, ph.jc, ph.kc)
        for o in range(obs.nobs):
            pk, r2, img, in_img, cap = obs_geometry(odev, o, ph)
            cost = ph.kx * pk[0] + ph.ky * pk[1] + ph.kz * pk[2]
            cost2 = cost * cost
            sint = jnp.sqrt(jnp.maximum(1.0 - cost2, 0.0))

            if par.use_stokes:
                # azimuth relative to the (m, n) triad
                # (peelingoff_rect.f90:365-377)
                sint_safe = jnp.maximum(sint, 1e-20)
                cosp = (pk[0] * ph.mx + pk[1] * ph.my + pk[2] * ph.mz) / sint_safe
                sinp = (pk[0] * ph.nnx + pk[1] * ph.nny + pk[2] * ph.nnz) / sint_safe
                cosp = jnp.where(sint == 0.0, 1.0, cosp)
                sinp = jnp.where(sint == 0.0, 0.0, sinp)
            else:
                # azimuth from the propagation-vector geometry
                # (peelingoff_rect.f90:637-648)
                rho1 = jnp.sqrt(jnp.maximum(1.0 - ph.kz * ph.kz, 0.0)) * sint
                inv = 1.0 / jnp.maximum(rho1, 1e-20)
                cosp = jnp.where(rho1 == 0.0, 1.0,
                                 inv * (cost * ph.kz - pk[2]))
                sinp = jnp.where(rho1 == 0.0, 0.0,
                                 inv * (ph.kx * pk[1] - pk[0] * ph.ky))

            xfreq = (xfreq_atom + (ua_x * cosp + ua_y * sinp) * sint
                     + ua_z * cost)
            if par.recoil:
                xfreq = xfreq - (line.g_recoil0 / D_cell) * (1.0 - cost)

            ixf, okf = freq_bin(grid, ph, pk, xfreq)
            act = jnp.logical_and(active, in_img)
            tau = tau_to_edge(grid, ph.x, ph.y, ph.z, ph.ic, ph.jc, ph.kc,
                              pk[0], pk[1], pk[2], xfreq, act, max_steps,
                              cap=cap)
            atten = jnp.exp(-jnp.minimum(tau, 700.0))

            idx = flat_idx(o, jnp.clip(ixf, 0, nxfreq - 1), img)
            okdep = jnp.logical_and(act, okf)

            if par.use_stokes:
                S22 = 0.75 * E1 * (cost2 + 1.0)
                S11 = S22 + E2
                S12 = 0.75 * E1 * (cost2 - 1.0)
                S33 = 1.5 * E1 * cost
                S44 = 1.5 * E3 * cost
                cos2p = 2.0 * cosp * cosp - 1.0
                sin2p = 2.0 * cosp * sinp
                Q0 = cos2p * ph.Q + sin2p * ph.U
                U0 = -sin2p * ph.Q + cos2p * ph.U
                Iobs = (S11 + S12 * Q0) / FOURPI
                Qobs = (S12 + S22 * Q0) / FOURPI
                Uobs = (S33 * U0) / FOURPI
                Vobs = (S44 * ph.V) / FOURPI
                # peel-frame normal vector, rotated to the detector
                pnx = -sinp * ph.mx + cosp * ph.nnx
                pny = -sinp * ph.my + cosp * ph.nny
                pnz = -sinp * ph.mz + cosp * ph.nnz
                R = odev.rmat[o]
                cosg = -(R[0, 0] * pnx + R[0, 1] * pny + R[0, 2] * pnz)
                sing = (R[1, 0] * pnx + R[1, 1] * pny + R[1, 2] * pnz)
                cos2g = 2.0 * cosg * cosg - 1.0
                sin2g = 2.0 * cosg * sing
                Qdet = cos2g * Qobs + sin2g * Uobs
                Udet = -sin2g * Qobs + cos2g * Uobs
                w = atten / r2 * ph.wgt
                depI = jnp.where(okdep, w * Iobs, 0.0)
                scatt = scatt.at[idx].add(depI)
                I = I.at[idx].add(depI)
                Q = Q.at[idx].add(jnp.where(okdep, w * Qdet, 0.0))
                U = U.at[idx].add(jnp.where(okdep, w * Udet, 0.0))
                V = V.at[idx].add(jnp.where(okdep, w * Vobs, 0.0))
            else:
                peel = 0.75 * E1 * (cost2 + 1.0) + E2
                w = peel / (FOURPI * r2) * atten * ph.wgt
                scatt = scatt.at[idx].add(jnp.where(okdep, w, 0.0))
        out = cubes._replace(scatt=scatt)
        if par.use_stokes:
            out = out._replace(I=I, Q=Q, U=U, V=V)
        return out

    mueller = None
    if par.use_stokes and meta.has_dust:
        from ..physics import mueller as mueller_mod
        mpath = par.scatt_mat_file.strip() or \
            mueller_mod.default_mueller_file(line.wavelength0)
        if mpath is not None:
            mueller = mueller_mod.load_mueller(mpath)

    lt8 = cfg.line.line_type == 8

    def peel_dust(cubes: PeelCubes, grid, odev, s, active):
        """Dust peel: HG phase (peeling_dust_nostokes_outside,
        peelingoff_rect.f90:484-575) or tabulated Mueller matrix with
        detector-frame Stokes rotation (peeling_dust_stokes_outside,
        :131-283).  In ly_beta runs, band-2 lanes use the H-alpha HG
        parameter and deposit into the peel_Ha cube with dust-only
        attenuation (peeling_dust_Ha_outside, peelingoff_rect.f90:801-871)."""
        scatt = cubes.scatt
        I, Q, U, V, Ha = cubes.I, cubes.Q, cubes.U, cubes.V, cubes.Ha
        iband = s.iband if lt8 else None
        b2 = (s.iband == 2) if lt8 else None
        g = jnp.where(b2, par.hgg_Ha, par.hgg) if lt8 else par.hgg
        for o in range(obs.nobs):
            pk, r2, img, in_img, cap = obs_geometry(odev, o, s)
            cosa = s.kx * pk[0] + s.ky * pk[1] + s.kz * pk[2]
            ixf, okf = freq_bin(grid, s, pk, s.xfreq, iband=iband)
            act = jnp.logical_and(active, in_img)
            tau = tau_to_edge(grid, s.x, s.y, s.z, s.ic, s.jc, s.kc,
                              pk[0], pk[1], pk[2], s.xfreq, act, max_steps,
                              cap=cap, iband=iband)
            atten = jnp.exp(-jnp.minimum(tau, 700.0))
            idx = flat_idx(o, jnp.clip(ixf, 0, nxfreq - 1), img)
            okdep = jnp.logical_and(act, okf)
            if mueller is not None:
                from ..physics.mueller import interp_S
                mmeta, mdev = mueller
                sint_o = jnp.sqrt(jnp.maximum(1.0 - cosa * cosa, 0.0))
                sint_safe = jnp.maximum(sint_o, 1e-20)
                cosp = (pk[0] * s.mx + pk[1] * s.my
                        + pk[2] * s.mz) / sint_safe
                sinp = (pk[0] * s.nnx + pk[1] * s.nny
                        + pk[2] * s.nnz) / sint_safe
                cosp = jnp.where(sint_o == 0.0, 1.0, cosp)
                sinp = jnp.where(sint_o == 0.0, 0.0, sinp)
                c2p = 2.0 * cosp * cosp - 1.0
                s2p = 2.0 * cosp * sinp
                dS11, dS12, dS33, dS34 = interp_S(mdev, mmeta, cosa)
                Q0 = c2p * s.Q + s2p * s.U
                U0 = -s2p * s.Q + c2p * s.U
                TWOPI = 2.0 * math.pi
                Iobs = (dS11 + dS12 * Q0) / TWOPI
                Qobs = (dS12 + dS11 * Q0) / TWOPI
                Uobs = (dS33 * U0 + dS34 * s.V) / TWOPI
                Vobs = (-dS34 * U0 + dS33 * s.V) / TWOPI
                pnx = -sinp * s.mx + cosp * s.nnx
                pny = -sinp * s.my + cosp * s.nny
                pnz = -sinp * s.mz + cosp * s.nnz
                R = odev.rmat[o]
                cosg = -(R[0, 0] * pnx + R[0, 1] * pny + R[0, 2] * pnz)
                sing = (R[1, 0] * pnx + R[1, 1] * pny + R[1, 2] * pnz)
                c2g = 2.0 * cosg * cosg - 1.0
                s2g = 2.0 * cosg * sing
                Qdet = c2g * Qobs + s2g * Uobs
                Udet = -s2g * Qobs + c2g * Uobs
                w = atten / r2 * s.wgt
                depI = jnp.where(okdep, w * Iobs, 0.0)
                scatt = scatt.at[idx].add(depI)
                I = I.at[idx].add(depI)
                Q = Q.at[idx].add(jnp.where(okdep, w * Qdet, 0.0))
                U = U.at[idx].add(jnp.where(okdep, w * Udet, 0.0))
                V = V.at[idx].add(jnp.where(okdep, w * Vobs, 0.0))
            else:
                peel = (1.0 - g * g) \
                    / (1.0 + g * g - 2.0 * g * cosa) ** 1.5 / FOURPI
                w = peel / r2 * atten * s.wgt
                if lt8:
                    scatt = scatt.at[idx].add(
                        jnp.where(jnp.logical_and(okdep, ~b2), w, 0.0))
                    Ha = Ha.at[idx].add(
                        jnp.where(jnp.logical_and(okdep, b2), w, 0.0))
                else:
                    scatt = scatt.at[idx].add(jnp.where(okdep, w, 0.0))
        out = cubes._replace(scatt=scatt)
        if lt8:
            out = out._replace(Ha=Ha)
        if mueller is not None:
            out = out._replace(I=I, Q=Q, U=U, V=V)
        return out

    def peel_conversion_Ha(cubes: PeelCubes, grid, odev, s, active,
                           ua_x, ua_y, ua_z):
        """Direct fluorescent peel of the newborn H-alpha photon at a
        ly_beta 3p->2s conversion event (peeling_conversion_Ha_outside,
        peelingoff_rect.f90:692-800): the H-alpha photon is emitted at line
        center in the ATOM frame so the frequency toward the observer is
        the atom-velocity projection only (no xfreq_atom term); dipole
        phase with the channel-2 E1/E2 weights; dust-only band-2 sightline
        attenuation; no recoil; deposits into the peel_Ha cube."""
        Ha = cubes.Ha
        E1, E2 = s['E1'], s['E2']
        ph = s['state']
        band2 = jnp.full(ph.x.shape, 2, jnp.int32)
        for o in range(obs.nobs):
            pk, r2, img, in_img, cap = obs_geometry(odev, o, ph)
            cost = ph.kx * pk[0] + ph.ky * pk[1] + ph.kz * pk[2]
            cost2 = cost * cost
            sint = jnp.sqrt(jnp.maximum(1.0 - cost2, 0.0))
            rho1 = jnp.sqrt(jnp.maximum(1.0 - ph.kz * ph.kz, 0.0)) * sint
            inv = 1.0 / jnp.maximum(rho1, 1e-20)
            cosp = jnp.where(rho1 == 0.0, 1.0, inv * (cost * ph.kz - pk[2]))
            sinp = jnp.where(rho1 == 0.0, 0.0,
                             inv * (ph.kx * pk[1] - pk[0] * ph.ky))
            # atom-frame line center: atom-velocity projection only
            xfreq = (ua_x * cosp + ua_y * sinp) * sint + ua_z * cost
            # lab-frame reference units via the event cell (freq_bin's
            # comoving branch implements (xfreq+u1)*D_cell/Dfreq_ref)
            ixf, okf = freq_bin(grid, ph, pk, xfreq)
            act = jnp.logical_and(active, in_img)
            tau = tau_to_edge(grid, ph.x, ph.y, ph.z, ph.ic, ph.jc, ph.kc,
                              pk[0], pk[1], pk[2], xfreq, act, max_steps,
                              cap=cap, iband=band2)
            peel = 0.75 * E1 * (cost2 + 1.0) + E2
            w = peel / (FOURPI * r2) * jnp.exp(-jnp.minimum(tau, 700.0)) \
                * ph.wgt
            idx = flat_idx(o, jnp.clip(ixf, 0, nxfreq - 1), img)
            Ha = Ha.at[idx].add(
                jnp.where(jnp.logical_and(act, okf), w, 0.0))
        return cubes._replace(Ha=Ha)

    # ------------------------------------------------------------------
    # stellar-illumination direct peel: stellar-disk visibility
    # ------------------------------------------------------------------
    sg = par.source_geometry.strip().lower()
    if sg == 'stellar_illumination':
        from ..physics.sources import sample_limb_cost
        if meta.grid_type == 'amr':
            from ..transport.engine import amr_find_cell
        Dsp = par.distance_star_to_planet
        Rs = par.stellar_radius
        Rmax = par.rmax if par.rmax > 0 else min(meta.xmax, meta.ymax,
                                                 meta.zmax)

        def peel_direct_stellar(cubes: PeelCubes, grid, odev, s, active,
                                key=None):
            """Stellar-disk direct peel
            (peeling_direct_stellar_illumination1,
            reference src/stellar_illumination.f90:953-1164; AMR variant
            :1636-1782): per newborn photon, sample ONE limb-darkened
            point on the stellar disk facing each observer; if the
            star-point->observer ray crosses the atmosphere sphere,
            attenuate by the tau through it; deposit 1/d^2_star-obs
            weights into Direct (and the unattenuated reference into
            Direct0 for transit-depth normalization)."""
            direc = cubes.direc
            direc0 = cubes.direc0
            I = cubes.I
            # newborn frequency -> lab frame in reference Doppler units
            D_cell = cell_Dfreq(grid, meta, s.ic, s.jc, s.kc)
            u1 = cell_velocity_dot(grid, meta, s.ic, s.jc, s.kc,
                                   s.kx, s.ky, s.kz) \
                if not meta.static_medium else 0.0
            xr = (s.xfreq + u1) * (D_cell / meta.Dfreq_ref)
            ixf = jnp.floor((xr - meta.xfreq_min)
                            / meta.dxfreq).astype(jnp.int32)
            okf = jnp.logical_and(ixf >= 0, ixf < nxfreq)
            # ONE surface sample (cost, vphi) per photon, shared across
            # observers (stellar_illumination.f90:1001-1032)
            cost = sample_limb_cost(jax.random.fold_in(key, 0),
                                    par.stellar_limb_darkening, s.x.shape)
            vphi = 2.0 * math.pi * jax.random.uniform(
                jax.random.fold_in(key, 1), s.x.shape, jnp.float32)
            cosvp, sinvp = jnp.cos(vphi), jnp.sin(vphi)
            for o in range(obs.nobs):
                ox, oy, oz = odev.pos[o, 0], odev.pos[o, 1], odev.pos[o, 2]
                # star->observer axis (star at (0,0,-Dsp))
                k0x, k0y, k0z = ox, oy, oz + Dsp
                d_so2 = k0x * k0x + k0y * k0y + k0z * k0z
                d_so = jnp.sqrt(d_so2)
                k0x, k0y, k0z = k0x / d_so, k0y / d_so, k0z / d_so
                cosvt0 = Rs / d_so
                cosvt = cost * jnp.sqrt(1.0 - cosvt0 ** 2
                                        + (cosvt0 * cost) ** 2) \
                    + cosvt0 * (1.0 - cost * cost)
                sinvt = jnp.sqrt(jnp.maximum(1.0 - cosvt * cosvt, 0.0))
                kr0 = jnp.sqrt(jnp.maximum(k0x * k0x + k0y * k0y, 0.0))
                pol = kr0 < 1e-11
                kr0s = jnp.maximum(kr0, 1e-11)
                xx = jnp.where(pol, sinvt * cosvp,
                               cosvt * k0x + sinvt * (k0z * k0x * cosvp
                                                      - k0y * sinvp) / kr0s)
                yy = jnp.where(pol, sinvt * sinvp,
                               cosvt * k0y + sinvt * (k0z * k0y * cosvp
                                                      + k0x * sinvp) / kr0s)
                zz = jnp.where(pol, jnp.sign(k0z) * cosvt,
                               cosvt * k0z - sinvt * cosvp * kr0)
                xx, yy, zz = Rs * xx, Rs * yy, Rs * zz - Dsp
                pkx, pky, pkz = ox - xx, oy - yy, oz - zz
                rr = jnp.sqrt(pkx * pkx + pky * pky + pkz * pkz)
                pkx, pky, pkz = pkx / rr, pky / rr, pkz / rr
                # TAN pixel
                R = odev.rmat[o]
                kx = R[0, 0] * pkx + R[0, 1] * pky + R[0, 2] * pkz
                ky = R[1, 0] * pkx + R[1, 1] * pky + R[1, 2] * pkz
                kz = R[2, 0] * pkx + R[2, 1] * pky + R[2, 2] * pkz
                ix = jnp.floor(jnp.arctan2(-kx, kz) * RAD2DEG / obs.dxim
                               + nxim / 2.0).astype(jnp.int32)
                iy = jnp.floor(jnp.arctan2(-ky, kz) * RAD2DEG / obs.dyim
                               + nyim / 2.0).astype(jnp.int32)
                in_img = jnp.logical_and(
                    jnp.logical_and(ix >= 0, ix < nxim),
                    jnp.logical_and(iy >= 0, iy < nyim))
                img = (jnp.clip(ix, 0, nxim - 1) * nyim
                       + jnp.clip(iy, 0, nyim - 1))
                # atmosphere-sphere crossing (bug-fixed check of
                # stellar_illumination.f90:1106-1112)
                r_dot_k = xx * pkx + yy * pky + zz * pkz
                rr2 = xx * xx + yy * yy + zz * zz
                det = r_dot_k * r_dot_k - (rr2 - Rmax * Rmax)
                crosses = jnp.logical_and(r_dot_k < 0.0, det >= 0.0)
                dist = -r_dot_k - jnp.sqrt(jnp.maximum(det, 0.0))
                ex = xx + pkx * dist
                ey = yy + pky * dist
                ez = zz + pkz * dist
                if meta.grid_type == 'amr':
                    eic = amr_find_cell(grid, meta, ex, ey, ez)
                    ejc = jnp.zeros_like(eic)
                    ekc = jnp.zeros_like(eic)
                elif meta.grid_type == 'clump':
                    eic = ejc = ekc = jnp.zeros(ex.shape, jnp.int32)
                else:
                    eic = jnp.clip(jnp.floor((ex - xmn) / dx
                                             ).astype(jnp.int32), 0, nx - 1)
                    ejc = jnp.clip(jnp.floor((ey - ymn) / dy
                                             ).astype(jnp.int32), 0, ny - 1)
                    ekc = jnp.clip(jnp.floor((ez - zmn) / dz
                                             ).astype(jnp.int32), 0, nz - 1)
                # lab frequency -> comoving at the entry cell
                if meta.grid_type != 'clump' and (
                        not meta.static_medium
                        or not meta.uniform_temperature):
                    u2 = cell_velocity_dot(grid, meta, eic, ejc, ekc,
                                           pkx, pky, pkz)
                    D2 = cell_Dfreq(grid, meta, eic, ejc, ekc)
                    xf_in = xr * meta.Dfreq_ref / D2 - u2
                else:
                    xf_in = xr
                act = jnp.logical_and(active, in_img)
                tau = tau_to_edge(grid, ex, ey, ez, eic, ejc, ekc,
                                  pkx, pky, pkz, xf_in,
                                  jnp.logical_and(act, crosses), max_steps)
                atten = jnp.where(crosses,
                                  jnp.exp(-jnp.minimum(tau, 700.0)), 1.0)
                # pobs%wgt = 1: limb darkening is importance-sampled
                w0 = 1.0 / d_so2
                okdep = jnp.logical_and(act, okf)
                idx = flat_idx(o, jnp.clip(ixf, 0, nxfreq - 1), img)
                direc = direc.at[idx].add(
                    jnp.where(okdep, w0 * atten, 0.0))
                if direc0 is not None:
                    direc0 = direc0.at[idx].add(jnp.where(okdep, w0, 0.0))
                if par.use_stokes:
                    I = I.at[idx].add(jnp.where(okdep, w0 * atten, 0.0))
            out = cubes._replace(direc=direc)
            if direc0 is not None:
                out = out._replace(direc0=direc0)
            if par.use_stokes:
                out = out._replace(I=I)
            return out

        return (peel_direct_stellar, peel_resonance, peel_dust,
                peel_conversion_Ha)

    return peel_direct, peel_resonance, peel_dust, peel_conversion_Ha
