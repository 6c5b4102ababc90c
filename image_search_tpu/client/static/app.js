// Client logic mirroring the Leptos app (client/src/app.rs, header.rs,
// image_card.rs, image_modal.rs) against the same HTTP contract.

const state = {
  results: [],          // [{id, image_path, score}]
  marked: new Set(),    // image_path strings submitted as referenced_images
};

const $ = (id) => document.getElementById(id);
const grid = $("grid");
const statusEl = $("status");

function setStatus(msg) { statusEl.textContent = msg; }

// --- search (app.rs:26-56, header.rs:13-20) --------------------------------

async function performSearch() {
  const q = $("search-input").value.trim();
  if (!q) return; // non-empty guard (header.rs:14)
  setStatus("searching…");
  try {
    const res = await fetch("/search", {
      method: "POST",
      headers: { "content-type": "application/json" },
      body: JSON.stringify({ q, referenced_images: [...state.marked] }),
    });
    if (!res.ok) throw new Error(`HTTP ${res.status}`);
    const data = await res.json();
    state.results = data.images || [];
    // marks persist across rounds (reference: marked_images RwSignal is
    // never cleared, app.rs:24) — feedback accumulates until un-checked
    render();
    setStatus(`${state.results.length} results`);
  } catch (err) {
    setStatus(`search failed: ${err.message}`);
  }
}

// --- scan (app.rs:59-69) ----------------------------------------------------

async function performScan() {
  const btn = $("scan-btn");
  btn.disabled = true;
  setStatus("scanning… (embeds every new image; may take a while)");
  try {
    const res = await fetch("/scan");
    if (!res.ok) throw new Error(`HTTP ${res.status}`);
    const stats = await res.json().catch(() => null);
    setStatus(stats
      ? `scan done: ${stats.embedded} new, ${stats.skipped_existing} known, ${stats.decode_failures} failed (${stats.seconds}s)`
      : "scan done");
  } catch (err) {
    setStatus(`scan failed: ${err.message}`);
  } finally {
    btn.disabled = false;
  }
}

// --- grid + cards (image_grid.rs, image_card.rs) -----------------------------

function render() {
  grid.replaceChildren(...state.results.map((img) => {
    const card = document.createElement("div");
    card.className = "card";
    card.dataset.id = img.id;

    // mark checkbox = relevance-feedback selection (image_card.rs:12-27)
    const mark = document.createElement("input");
    mark.type = "checkbox";
    mark.className = "mark";
    mark.checked = state.marked.has(img.image_path);
    mark.addEventListener("change", () => {
      if (mark.checked) state.marked.add(img.image_path);
      else state.marked.delete(img.image_path);
      card.classList.toggle("marked", mark.checked);
    });

    const pic = document.createElement("img");
    pic.loading = "lazy";
    pic.src = img.image_path; // relative media/... URL (image_card.rs:52-62)
    pic.alt = img.image_path;
    pic.addEventListener("click", () => openModal(img.image_path));

    if (mark.checked) card.classList.add("marked");
    card.append(mark, pic);
    return card;
  }));
}

// --- zoom/pan modal (image_modal.rs) -----------------------------------------

const modal = $("modal");
const modalImg = $("modal-img");
let zoom = 1, panX = 0, panY = 0, dragging = false, lastX = 0, lastY = 0;

function applyTransform() {
  modalImg.style.transform = `translate(${panX}px, ${panY}px) scale(${zoom})`;
}

function openModal(src) {
  zoom = 1; panX = 0; panY = 0;
  modalImg.src = src;
  applyTransform();
  modal.classList.remove("hidden");
}

function closeModal() { modal.classList.add("hidden"); }

// wheel-zoom about the cursor, clamped to [0.5, 5] (image_modal.rs:14-34)
modal.addEventListener("wheel", (e) => {
  e.preventDefault();
  const factor = e.deltaY < 0 ? 1.1 : 1 / 1.1;
  const next = Math.min(5.0, Math.max(0.5, zoom * factor));
  const rect = modalImg.getBoundingClientRect();
  const cx = e.clientX - (rect.left + rect.width / 2);
  const cy = e.clientY - (rect.top + rect.height / 2);
  const applied = next / zoom;
  panX -= cx * (applied - 1);
  panY -= cy * (applied - 1);
  zoom = next;
  applyTransform();
}, { passive: false });

// mouse-drag panning (image_modal.rs:36-55)
modal.addEventListener("mousedown", (e) => {
  if (e.target !== modalImg) return;
  dragging = true; lastX = e.clientX; lastY = e.clientY;
  modal.style.cursor = "grabbing";
  e.preventDefault();
});
window.addEventListener("mousemove", (e) => {
  if (!dragging) return;
  panX += e.clientX - lastX;
  panY += e.clientY - lastY;
  lastX = e.clientX; lastY = e.clientY;
  applyTransform();
});
window.addEventListener("mouseup", () => {
  dragging = false;
  modal.style.cursor = "grab";
});

// click outside the image closes (image_modal.rs:68)
modal.addEventListener("click", (e) => {
  if (e.target === modal) closeModal();
});
window.addEventListener("keydown", (e) => {
  if (e.key === "Escape") closeModal();
});

// --- wiring -------------------------------------------------------------------

$("search-input").addEventListener("keydown", (e) => {
  if (e.key === "Enter") performSearch();
});
$("scan-btn").addEventListener("click", performScan);
